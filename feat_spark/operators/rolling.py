"""Rolling order statistics over bounded row frames.

Rolling mean/sum have exact closed forms (``operators/windows.py``,
``operators/chunked.py``); a rolling MEDIAN does not — it is an order
statistic, the robust location estimate a monitoring or feature
pipeline wants when the signal has fat tails (a single spiked value
drags a rolling mean for the whole window but moves the median one
rank). Spark's window machinery accepts ANY aggregate over a frame, so
the operator stays fully declarative: ``percentile(x, 0.5)`` over a
``ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW`` frame — JVM-side,
whole-stage-codegen framed, no UDF.

Exactness discipline (the repo-wide device): the caller hands an
INTEGER-valued column (e.g. cents). The median of ≤k integers is
either an integer or a half-integer — both exact in double — so the
statistic is bit-portable to any engine whose median interpolates
(DuckDB ``quantile_cont`` on integers replays it bit-for-bit; the
selfcheck memory note pins this equivalence).

Scale shape: one hash exchange on the partition key + one sort — the
same single (exchange, sort) pair every windowed operator in this
engine rides; the frame is ROW-BOUNDED (k rows buffered per task,
O(k) memory regardless of partition size), so a hot entity makes a
long sorted run, not a blown buffer. For pathological single-key skew
the chunked prefix-sum device does not apply (medians don't combine),
but a bounded frame keeps the per-row cost O(k) — at k≤100 this is
compute-bound, not memory-bound, at any partition size.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rolling_median(
    df: DataFrame,
    part_col: str,
    order_cols: list[str],
    value_col: str,
    window_rows: int = 5,
    out_col: str = "rolling_median",
) -> DataFrame:
    """Append ``out_col``: the exact median of ``value_col`` over the
    trailing ``window_rows``-row frame (current row inclusive) within
    each ``part_col`` partition, ordered by ``order_cols``.

    ``order_cols`` must be a TOTAL order within each partition (pass a
    unique tiebreaker last) — otherwise the frame contents, and hence
    the median, are nondeterministic under shuffle order.

    ``value_col`` should be integer-valued (cast your metric to cents
    first) for cross-engine bit-exactness; rows with NULL values are
    skipped by the aggregate, and a frame of all-NULLs yields NULL.
    Fewer than ``window_rows`` preceding rows → median of what exists
    (both Spark and SQL engines agree on this semantics).
    """
    if window_rows < 1:
        raise ValueError("window_rows must be >= 1")
    w = (
        Window.partitionBy(part_col)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(-(window_rows - 1), Window.currentRow)
    )
    med: Column = F.percentile(F.col(value_col), F.lit(0.5)).over(w)
    return df.withColumn(out_col, med)


def rolling_corr(
    df: DataFrame,
    key_cols: "Sequence[str] | str",
    order_cols: "Sequence[str]",
    x_col: str,
    y_col: str,
    window: int = 20,
    out_col: str = "r",
    min_periods: int = 3,
) -> DataFrame:
    """Rolling Pearson correlation between two metrics over the
    trailing ``window`` rows per key — the co-movement monitor
    (does latency track load? does spend track engagement?) at event
    grain.

    Exactness discipline (module rule): both inputs quantize to
    integer cents first; every windowed sum (``sx, sy, sxx, syy,
    sxy``) is then an INTEGER aggregate over a bounded frame — order-
    free and exact (products bounded by cents²·window < 2^53 for sane
    metrics). The closed form
    ``(n·sxy − sx·sy) / sqrt((n·sxx − sx²) · (n·syy − sy²))``
    has an exact integer numerator and radicand; one sqrt + one
    division in double, 6dp. Zero-variance windows (either side) are
    NULL, as are windows shorter than ``min_periods``.

    One exchange + one sort; all five sums share the single window
    frame (Spark collapses same-spec window functions into one
    physical window operator).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order_cols)
        .rowsBetween(-(window - 1), 0)
    )
    x = F.round(F.col(x_col) * 100).cast("long")
    y = F.round(F.col(y_col) * 100).cast("long")
    base = df.withColumn("__x", x).withColumn("__y", y)
    n = F.count(F.lit(1)).over(w)
    sx = F.sum("__x").over(w)
    sy = F.sum("__y").over(w)
    sxx = F.sum(F.col("__x") * F.col("__x")).over(w)
    syy = F.sum(F.col("__y") * F.col("__y")).over(w)
    sxy = F.sum(F.col("__x") * F.col("__y")).over(w)
    num = (n * sxy - sx * sy).cast("double")
    varx = (n * sxx - sx * sx).cast("double")
    vary = (n * syy - sy * sy).cast("double")
    r = F.when(
        (n >= min_periods) & (varx > 0) & (vary > 0),
        F.round(num / F.sqrt(varx * vary), 6),
    )
    return base.withColumn(out_col, r).drop("__x", "__y")


def reset_cumsum(
    df: DataFrame,
    key_cols: "Sequence[str] | str",
    ts_col: str,
    tiebreak_col: str,
    delta_col: str,
    reset_col: str,
) -> DataFrame:
    """Running balance with resets — per key, the cumulative sum of
    ``delta_col`` that restarts whenever ``reset_col`` fires: the
    counter/balance/quota reconstruction every metering, billing, and
    session-budget pipeline runs (``windows.cumulative`` is the
    never-resetting half; this is the gaps-and-islands half).

    Semantics: a reset row ZEROES the balance first, then applies its
    own delta — so the reset row's balance is exactly its delta. Two
    stacked windows sharing ONE partition sort: segment id = running
    count of resets up to and including the row (cumsum over the
    (ts, tiebreak) order), then balance = cumsum of deltas within
    (key, segment). Catalyst reuses the exchange; integer deltas make
    every balance exact.

    Output: input keys + ``(ts, tiebreak, delta, segment, balance)``.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    order = [F.col(ts_col).asc(), F.col(tiebreak_col).asc()]
    w_seg = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    seg = F.sum(F.col(reset_col).cast("long")).over(w_seg)
    d = df.withColumn("__seg", seg)
    w_bal = (
        Window.partitionBy(*keys, "__seg")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return d.withColumn(
        "balance", F.sum(F.col(delta_col).cast("long")).over(w_bal)
    ).select(
        *keys,
        F.col(ts_col),
        F.col(tiebreak_col),
        F.col(delta_col).alias("delta"),
        F.col("__seg").alias("segment"),
        "balance",
    )
