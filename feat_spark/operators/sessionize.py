"""Sessionization: gap-based session ids + session-window aggregates.

Two equivalent paths (SURVEY.md §2.8):

* ``sessionize`` — batch-native: flag rows whose gap from the previous
  turn exceeds ``gap``, running-sum the flags → a dense ``session_id``
  per conversation. One shuffle + one sort; every turn keeps its row
  (needed when sessions are a *feature* of the turn).
* ``session_window_agg`` — Spark's native ``F.session_window`` for
  per-session rollups; identical semantics under Structured Streaming
  with a watermark.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from feat_spark.operators.windows import _cols, turn_window


def sessionize(
    df: DataFrame,
    gap: str = "30 minutes",
    partition: str | Sequence[str] = "conv_id",
    ts: str = "ts",
    tiebreak: str | Sequence[str] = ("turn_idx",),
    out_col: str = "session_id",
    order_col: str | None = None,
) -> DataFrame:
    """Assign 0-based ``session_id`` per conversation: a new session
    starts when ``ts - previous ts > gap`` (strict, matching
    ``F.session_window`` whose window is [start, last+gap)).

    ``order_col`` switches the row ordering from ``(ts, tiebreak)`` to
    ``(order_col, tiebreak)`` — for transcripts, ordering by
    ``turn_idx`` (the arrival sequence) is semantically identical when
    ``ts`` is nondecreasing per conversation AND lets Catalyst share
    ONE sort with every other turn-ordered window in the pipeline
    instead of adding a second sort order."""
    order = (order_col,) if order_col else (ts,)
    w = turn_window(partition, order=order, tiebreak=tiebreak)
    gap_expr = F.expr(f"INTERVAL {gap}")
    prev_ts = F.lag(ts).over(w)
    new_session = F.when(
        prev_ts.isNull() | (F.col(ts) - prev_ts > gap_expr), F.lit(1)
    ).otherwise(F.lit(0))
    cum = Window.partitionBy(*_cols(partition)).orderBy(
        *[F.col(c) for c in (*order, *_cols(tiebreak))]
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out_col, (F.sum(new_session).over(cum) - 1).cast("int"))


def session_agg(
    df: DataFrame,
    aggs: Sequence[Column],
    gap: str = "30 minutes",
    partition: str | Sequence[str] = "conv_id",
    ts: str = "ts",
    tiebreak: str | Sequence[str] = ("turn_idx",),
) -> DataFrame:
    """Per-session rollup via gap-based ids (batch path)."""
    with_ids = sessionize(df, gap, partition, ts, tiebreak)
    return with_ids.groupBy(*_cols(partition), "session_id").agg(
        F.min(ts).alias("session_start"), F.max(ts).alias("session_end"), *aggs
    )


def session_window_agg(
    df: DataFrame,
    aggs: Sequence[Column],
    gap: str = "30 minutes",
    partition: str | Sequence[str] = "conv_id",
    ts: str = "ts",
) -> DataFrame:
    """Native ``F.session_window`` rollup — the streaming-ready form.

    Note the bound difference vs ``session_agg``: Spark's session window
    end is ``last_event + gap`` (a half-open horizon), while
    ``session_agg`` reports the last *observed* event. Both mark session
    *membership* identically.
    """
    return (
        df.groupBy(*_cols(partition), F.session_window(F.col(ts), gap).alias("sw"))
        .agg(*aggs)
        .withColumn("session_start", F.col("sw.start"))
        .withColumn("session_horizon", F.col("sw.end"))
        .drop("sw")
    )
