"""Chunked (salted) window operators must agree bit-for-bit with the
plain single-partition-per-key operators — hot key included — while
never holding more than chunk_width rows of one key in a task.

chunk_width is set tiny (7) so every conversation spans many chunks and
all boundary paths (first row of chunk, all-null chunks, single-row
chunks) are exercised.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from feat_spark.operators.chunked import (
    chunked_cumulative,
    chunked_lag,
    chunked_row_number,
    chunked_sessionize,
)
from feat_spark.operators.sessionize import sessionize
from feat_spark.operators.windows import (
    cumulative_features,
    lag_lead_features,
    with_stable_order,
)
from feat_spark.sources.synth import synth_transcripts

WIDTH = 7


@pytest.fixture(scope="module")
def turns(spark):
    df = synth_transcripts(spark, n_convs=40, mean_turns=12, seed=7)
    # a nullable numeric column exercises null-handling in running aggs
    return df.withColumn(
        "val",
        F.when(F.col("turn_idx") % 3 != 0, F.col("turn_idx").cast("long") * 10),
    ).cache()


def _sorted(df, cols):
    return df.select(*cols).orderBy("conv_id", "turn_idx").collect()


def test_chunked_cumulative_matches_plain(turns):
    plain = cumulative_features(
        turns, {"val": ["sum", "count", "min", "max"]}, tiebreak=("ts",)
    )
    chunked = chunked_cumulative(
        turns, {"val": ["sum", "count", "min", "max"]},
        tiebreak=("ts",), chunk_width=WIDTH,
    )
    cols = ["conv_id", "turn_idx"] + [f"val_cum_{f}" for f in ("sum", "count", "min", "max")]
    assert _sorted(plain, cols) == _sorted(chunked, cols)


def test_chunked_cumulative_exclusive_frame(turns):
    plain = cumulative_features(
        turns, {"val": ["sum"]}, tiebreak=("ts",), include_current=False
    )
    chunked = chunked_cumulative(
        turns, {"val": ["sum"]}, tiebreak=("ts",),
        chunk_width=WIDTH, include_current=False,
    )
    cols = ["conv_id", "turn_idx", "val_cum_sum"]
    assert _sorted(plain, cols) == _sorted(chunked, cols)


def test_chunked_row_number_matches_plain(turns):
    plain = with_stable_order(turns)
    chunked = chunked_row_number(turns, chunk_width=WIDTH)
    cols = ["conv_id", "turn_idx", "turn_seq"]
    assert _sorted(plain, cols) == _sorted(chunked, cols)


def test_chunked_lag_matches_plain(turns):
    plain = lag_lead_features(
        turns, cols=["val", "role"], offsets=[1], leads=False
    )
    chunked = chunked_lag(turns, cols=["val", "role"], chunk_width=WIDTH)
    cols = ["conv_id", "turn_idx", "val_lag1", "role_lag1"]
    assert _sorted(plain, cols) == _sorted(chunked, cols)


def test_chunked_sessionize_matches_plain(turns):
    # plain sessionize orders by ts (tiebreak turn_idx); synth ts is
    # nondecreasing in turn_idx per conversation, so turn_idx order ==
    # (ts, turn_idx) order and both must agree exactly.
    plain = sessionize(turns, gap="30 minutes", tiebreak=("turn_idx",))
    chunked = chunked_sessionize(turns, gap="30 minutes", chunk_width=WIDTH)
    cols = ["conv_id", "turn_idx", "session_id"]
    assert _sorted(plain, cols) == _sorted(chunked, cols)


def test_chunked_bounds_partition_size(turns):
    """No (key, chunk) group may exceed chunk_width rows — the skew
    guarantee the whole module exists for."""
    from feat_spark.operators.chunked import with_chunks

    g = (
        with_chunks(turns, "turn_idx", WIDTH)
        .groupBy("conv_id", "__chunk")
        .count()
        .agg(F.max("count").alias("m"))
        .collect()[0]["m"]
    )
    assert g <= WIDTH


def test_composite_matches_plain_pipeline(turns):
    from feat_spark.operators.chunked import chunked_turn_features

    plain = with_stable_order(turns)
    plain = lag_lead_features(plain, cols=["val"], offsets=[1], leads=False, tiebreak=("ts",))
    plain = cumulative_features(plain, {"val": ["sum", "count"]}, tiebreak=("ts",))
    plain = sessionize(plain, gap="30 minutes", tiebreak=("turn_idx",))

    comp = chunked_turn_features(
        turns, lag_cols=("val",), cum_aggs={"val": ["sum", "count"]},
        gap="30 minutes", chunk_width=WIDTH, tiebreak=("ts",),
    )
    cols = ["conv_id", "turn_idx", "turn_seq", "val_lag1",
            "val_cum_sum", "val_cum_count", "session_id"]
    assert _sorted(plain, cols) == _sorted(comp, cols)
