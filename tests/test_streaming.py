"""Streaming/batch parity: the same rows through the streaming
operators (real streaming queries: file source, availableNow trigger,
memory sink) must produce what the batch operators produce — including
state carried across micro-batches for the custom stateful op."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from feat_spark.operators.sessionize import sessionize, session_window_agg
from feat_spark.operators.windows import cumulative_features, tumbling_window_agg
from feat_spark.sources.synth import synth_transcripts_pdf, TRANSCRIPT_SCHEMA
from feat_spark.streaming.pipeline import (
    read_transcript_stream,
    run_to_memory,
    session_stream_agg,
    stateful_turn_features,
    tumbling_stream_agg,
)


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    """Transcripts split into TWO parquet files, sorted so each
    conversation's turns arrive in turn order across micro-batches
    (the stateful operator's documented contract)."""
    d = tmp_path_factory.mktemp("turnstream")
    pdf = synth_transcripts_pdf(n_convs=25, mean_turns=12, seed=5)
    pdf = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    cut = len(pdf) // 2
    pdf.iloc[:cut].to_parquet(os.path.join(d, "part1.parquet"), index=False)
    pdf.iloc[cut:].to_parquet(os.path.join(d, "part2.parquet"), index=False)
    return str(d)


@pytest.fixture(scope="module")
def batch_df(spark, stream_dir):
    return spark.read.schema(TRANSCRIPT_SCHEMA).parquet(stream_dir).cache()


def test_tumbling_parity(spark, stream_dir, batch_df):
    stream = read_transcript_stream(spark, stream_dir)
    # complete mode: append would hold back windows the watermark has
    # not closed at end-of-input, which is all of them for a finite test
    run_to_memory(tumbling_stream_agg(stream, "1 hour"), "tumb", "complete")
    got = {
        (r["conv_id"], r["win_start"]): (r["n_turns"], r["chars"])
        for r in spark.table("tumb").collect()
    }
    want = {
        (r["conv_id"], r["win_start"]): (r["n"], r["chars"])
        for r in tumbling_window_agg(
            batch_df,
            [F.count(F.lit(1)).alias("n"), F.sum(F.length("text")).alias("chars")],
            duration="1 hour",
        ).collect()
    }
    assert got == want


def test_session_window_parity(spark, stream_dir, batch_df):
    stream = read_transcript_stream(spark, stream_dir)
    run_to_memory(session_stream_agg(stream, "30 minutes"), "sess", "complete")
    got = {
        (r["conv_id"], r["session_start"]): r["n_turns"]
        for r in spark.table("sess").collect()
    }
    want = {
        (r["conv_id"], r["session_start"]): r["n_turns"]
        for r in session_window_agg(
            batch_df, [F.count(F.lit(1)).alias("n_turns")], gap="30 minutes"
        ).collect()
    }
    assert got == want


def test_stateful_turn_features_parity(spark, stream_dir, batch_df):
    """The applyInPandasWithState op must carry (count, last_ts,
    session) across the two files == two micro-batches."""
    stream = read_transcript_stream(spark, stream_dir, max_files_per_trigger=1)
    run_to_memory(stateful_turn_features(stream, "30 minutes"), "statef", "append")
    got = {
        (r["conv_id"], r["turn_idx"]): (r["turns_so_far"], r["session_id"])
        for r in spark.table("statef").collect()
    }

    want_df = sessionize(batch_df, "30 minutes", tiebreak=("turn_idx",))
    want_df = cumulative_features(want_df, {"turn_idx": ["count"]}, tiebreak=("ts",))
    want = {
        (r["conv_id"], r["turn_idx"]): (r["turn_idx_cum_count"], r["session_id"])
        for r in want_df.collect()
    }
    assert len(got) == batch_df.count()
    assert got == want
