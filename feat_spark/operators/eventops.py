"""Event-stream cleaning operators that sit BESIDE sessionization.

Lives OUTSIDE the flagship benchmark closure on purpose: additive
operators must not land in ``operators/sessionize.py`` (or any module
``bench.py`` transitively imports) — ``tools/bench_scaling.py`` hashes
that closure to gate published scaling rows, and byte-drift there
invalidates the campaign identity (see ``sources/layout.py`` for the
same rule).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def debounce_events(
    df: DataFrame,
    key_cols: "Sequence[str] | str",
    gap_s: int,
    ts_col: str = "ts",
    tiebreak: "Sequence[str]" = ("event_id",),
    out_col: str = "kept",
) -> DataFrame:
    """Burst-collapse debounce — within each key, collapse runs of
    events whose consecutive gaps are <= ``gap_s`` down to their FIRST
    event: the telemetry-cleaning step for double-clicks, retry
    storms, and sensor chatter, and the event-stream twin of the text
    near-dup collapse.

    Semantics are ISLAND debounce (a new burst starts when the gap
    from the PREVIOUS event exceeds ``gap_s``) — the same
    gaps-and-islands device as :func:`feat_spark.operators.sessionize.
    sessionize`, so it is one lag + one cumulative flag over a single
    per-key sort, fully relational. This differs from greedy
    fixed-window debounce (window anchored at the last KEPT event)
    exactly when a chain of sub-gap events outlives one window —
    greedy is an inherently sequential recurrence; island is the
    declarative form engines and stream processors actually ship.

    Returns every row plus boolean ``out_col`` (filter downstream —
    audits want to see what was dropped).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(*keys).orderBy(
        "__t", *[F.col(c) for c in tiebreak]
    )
    base = df.withColumn("__t", us)
    gap = F.col("__t") - F.lag("__t").over(w)
    return (
        base.withColumn(
            out_col,
            gap.isNull() | (gap > F.lit(int(gap_s) * 1_000_000)),
        )
        .drop("__t")
    )
