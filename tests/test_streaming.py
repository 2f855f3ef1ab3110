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
    _space_mtimes(d, ["part1.parquet", "part2.parquet"])
    return str(d)


def _space_mtimes(d, names, gap_s=60):
    """FileStreamSource orders micro-batches by file modification time;
    files written milliseconds apart can tie and arrive in either order
    (observed flake). Pin an unambiguous order."""
    import time

    base = time.time() - gap_s * (len(names) + 1)
    for i, name in enumerate(names):
        t = base + i * gap_s
        os.utime(os.path.join(d, name), (t, t))


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


@pytest.fixture(scope="module")
def asof_stream_dirs(spark, tmp_path_factory):
    """Two source streams: conv_attrs (one file) and transcripts (two
    files, conversation-ordered) — batch 2's turns must match
    attributes held in STATE from batch 1."""
    from feat_spark.sources.synth import synth_conv_attrs_pdf

    td = tmp_path_factory.mktemp("asof_turns")
    ad = tmp_path_factory.mktemp("asof_attrs")
    tpdf = synth_transcripts_pdf(n_convs=20, mean_turns=10, seed=9)
    tpdf = tpdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    cut = len(tpdf) // 2
    tpdf.iloc[:cut].to_parquet(os.path.join(td, "part1.parquet"), index=False)
    tpdf.iloc[cut:].to_parquet(os.path.join(td, "part2.parquet"), index=False)
    _space_mtimes(td, ["part1.parquet", "part2.parquet"])
    synth_conv_attrs_pdf(n_convs=20, seed=9).to_parquet(
        os.path.join(ad, "attrs.parquet"), index=False
    )
    return str(td), str(ad)


def test_stateful_asof_stream_parity(spark, asof_stream_dirs):
    """Stream-stream as-of (state across micro-batches) == the batch
    union_window as-of on the same rows. The turns source feeds one
    file per micro-batch, so half the turns can only match through the
    carried attribute state."""
    from feat_spark.operators.asof import asof_join
    from feat_spark.sources.synth import CONV_ATTRS_SCHEMA
    from feat_spark.streaming.pipeline import stateful_asof_stream

    td, ad = asof_stream_dirs
    turns = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(td)
    )
    attrs = spark.readStream.schema(CONV_ATTRS_SCHEMA).parquet(ad)
    out = stateful_asof_stream(turns, attrs, on="conv_id", ts="ts")
    run_to_memory(out, "asof_stream", "append")
    got = {
        (r["conv_id"], r["turn_idx"]): (r["attr_hash"], r["plan"])
        for r in spark.table("asof_stream").collect()
    }

    batch_turns = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(td)
    batch_attrs = spark.read.schema(CONV_ATTRS_SCHEMA).parquet(ad)
    want = {
        (r["conv_id"], r["turn_idx"]): (r["attr_hash"], r["plan"])
        for r in asof_join(batch_turns, batch_attrs, on="conv_id").collect()
    }
    assert len(got) == batch_turns.count()
    assert got == want


def _write_turn_file(d, name, rows):
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pdf.to_parquet(os.path.join(d, name), index=False)


def test_state_ttl_eviction(spark, tmp_path_factory):
    """Event-time TTL (advisor finding: NoTimeout grew state with total
    conversation cardinality forever): a conversation idle past
    watermark + ttl is evicted and restarts fresh; a long ttl carries
    state across the same gap."""
    import pandas as pd

    d = str(tmp_path_factory.mktemp("ttl"))
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    D = pd.Timedelta
    _write_turn_file(d, "f1.parquet", [("a", 1, t0), ("a", 2, t0 + D("5 minutes"))])
    _write_turn_file(d, "f2.parquet", [("b", 1, t0 + D("40 days"))])
    # batch 3: 'a' has no data and the watermark (t0+40d-2h) now exceeds
    # its last-activity+ttl timeout -> evicted (small ttl only)
    _write_turn_file(d, "f3.parquet", [("b", 2, t0 + D("40 days 1 hour"))])
    _write_turn_file(d, "f4.parquet", [("a", 3, t0 + D("40 days 2 hours"))])
    names = ["f1.parquet", "f2.parquet", "f3.parquet", "f4.parquet"]
    _space_mtimes(d, names)
    schema = "conv_id string, turn_idx int, ts timestamp"

    def run(ttl, sink):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        run_to_memory(stateful_turn_features(stream, "30 minutes", state_ttl=ttl), sink)
        return {
            (r["conv_id"], r["turn_idx"]): r["turns_so_far"]
            for r in spark.table(sink).collect()
        }

    evicted = run("1 day", "ttl_small")
    assert evicted[("a", 3)] == 1  # state dropped: fresh conversation
    kept = run("3650 days", "ttl_large")
    assert kept[("a", 3)] == 3  # state carried across the gap


def test_stream_exact_dedup_and_bounded_state(spark, tmp_path_factory):
    """stream_exact_dedup: (a) byte-identical duplicates — intra- and
    cross-batch — never re-emit while state lives; (b) the bounded-state
    trade: a re-emission stamped with a FRESH event time beyond the
    watermark delay passes through as a new row (its state was evicted).
    The driver gate `stream_dedup` is the corpus-scale oracle-checked
    twin of (a)."""
    import uuid

    import pandas as pd

    from feat_spark.streaming.pipeline import run_to_memory, stream_exact_dedup

    base = pd.Timestamp("2024-01-01 00:00:00", tz="UTC")
    hr = pd.Timedelta(hours=1)
    # batch 1: A, B, plus an immediate duplicate of A; filler F drives
    # the watermark (wm after batch1 = t0+3h - 1h = t0+2h > A's ts)
    b1 = pd.DataFrame({
        "event_id": [1, 2, 1, 9],
        "ts": [base, base + hr, base, base + 3 * hr],
        "v": [10.0, 20.0, 10.0, 90.0],
    })
    # batch 2: duplicate of B with its ORIGINAL ts (late beyond wm ->
    # dropped) plus a filler advancing the watermark further; A's state
    # (expired at t0+1h, wm already t0+2h) is evicted at this batch's end
    b2 = pd.DataFrame({
        "event_id": [2, 8],
        "ts": [base + hr, base + 5 * hr],
        "v": [20.0, 80.0],
    })
    # batch 3: re-emission of A with a FRESH event time -> its state is
    # gone, so it passes through as a new row (the bounded-state trade)
    b3 = pd.DataFrame({
        "event_id": [1],
        "ts": [base + 6 * hr],
        "v": [11.0],
    })
    d = tmp_path_factory.mktemp("dedupstream")
    for i, b in enumerate((b1, b2, b3), start=1):
        b.to_parquet(os.path.join(d, f"part{i}.parquet"), index=False,
                     coerce_timestamps="us", allow_truncated_timestamps=True)
    _space_mtimes(d, ["part1.parquet", "part2.parquet", "part3.parquet"])

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    out = stream_exact_dedup(stream, keys=["event_id"], ts_col="ts", delay="1 hour")
    name = "t_dedup_" + uuid.uuid4().hex[:8]
    run_to_memory(out, name)
    rows = sorted(
        (r["event_id"], r["v"]) for r in spark.table(name).collect()
    )
    # A once from batch1 (dup deduped), B once (late dup dropped),
    # fillers once each, A's fresh-ts re-emission once more
    assert rows == [(1, 10.0), (1, 11.0), (2, 20.0), (8, 80.0), (9, 90.0)]


def test_stateful_zscore_stream_cross_batch_parity(spark, tmp_path_factory):
    """Rows early in micro-batch 2 must be scored against ring-buffer
    history carried from batch 1, matching the batch operator on the
    unioned data bit-for-bit."""
    import uuid

    import pandas as pd

    from feat_spark.operators.windows import rolling_zscore
    from feat_spark.streaming.pipeline import (
        run_to_memory,
        stateful_zscore_stream,
    )

    d = str(tmp_path_factory.mktemp("zs_stream"))
    base = pd.Timestamp("2024-01-01", tz="UTC")
    rows = []
    vals = [10.0, 11.0, 9.0, 10.5, 9.5, 10.2, 9.8, 50.0, 10.1, 9.9, 10.3, 9.7]
    for i, v in enumerate(vals):
        rows.append((i + 1, 1, base + pd.Timedelta(minutes=i), v))
    # second quieter user crossing the boundary too
    for i in range(8):
        rows.append((100 + i, 2, base + pd.Timedelta(minutes=i), 5.0 + i))
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    pdf = pdf.sort_values("ts").reset_index(drop=True)
    cut_ts = pdf["ts"].iloc[len(pdf) // 2]
    opts = dict(index=False, coerce_timestamps="us",
                allow_truncated_timestamps=True)
    pdf[pdf["ts"] < cut_ts].to_parquet(f"{d}/p1.parquet", **opts)
    pdf[pdf["ts"] >= cut_ts].to_parquet(f"{d}/p2.parquet", **opts)
    _space_mtimes(d, ["p1.parquet", "p2.parquet"])

    df = spark.createDataFrame(pdf)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1).parquet(d)
    )
    out = stateful_zscore_stream(
        stream, n=6, min_periods=3, keys="user_id", watermark="3650 days"
    )
    name = "zs_" + uuid.uuid4().hex[:8]
    run_to_memory(out, name)
    got = (
        spark.table(name)
        .select("event_id", "roll_mean", "roll_std", "zscore", "is_anomaly")
        .toPandas().sort_values("event_id").reset_index(drop=True)
    )
    want = (
        rolling_zscore(df, value_col="value", keys="user_id",
                       order=("ts", "event_id"), n=6, min_periods=3)
        .select("event_id", "roll_mean", "roll_std", "zscore", "is_anomaly")
        .toPandas().sort_values("event_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # the spike (event 8) is flagged, in whichever batch it landed
    assert bool(got.set_index("event_id").loc[8, "is_anomaly"])
