"""Incremental rollup maintenance — the algebraic-aggregate merge.

A 100 TB daily rollup is never recomputed from scratch: yesterday's
aggregate STATE plus today's delta must merge into exactly the
aggregate of the union. That works precisely for ALGEBRAIC aggregates
— ones whose state is a fixed-width tuple with a commutative,
associative combine (count: sum of counts; sum: sum of sums; min/max:
min/max of states; avg: DERIVED from (sum, count) at read time, never
stored as a ratio). Medians and distincts are NOT algebraic — they
need full data or a mergeable sketch (``sketches`` gate) — and this
module's spec only admits the algebraic kinds, so the unexpressible
cases fail loudly at plan time instead of drifting silently.

``merge_rollup(prev, delta)`` is ONE unionByName + ONE partial agg
keyed by the rollup keys: the delta is a day of data, the state is
dimension-sized, and the combine runs map-side — the incremental
cost is O(delta + state), independent of history length. The gate
proves the defining identity: rollup(old) ⊕ rollup(new) ==
rollup(old ∪ new), bit-for-bit (decimal sums make the partial-agg
order irrelevant).

Lives OUTSIDE the flagship benchmark closure on purpose (see
``operators/eventops.py`` for the rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: measure kind -> (state builder, state combiner)
_KINDS = {
    "count": (
        lambda c: F.count(F.lit(1)),
        lambda name: F.sum(name),
    ),
    "sum": (
        lambda c: F.sum(c),
        lambda name: F.sum(name),
    ),
    "min": (
        lambda c: F.min(c),
        lambda name: F.min(name),
    ),
    "max": (
        lambda c: F.max(c),
        lambda name: F.max(name),
    ),
}


def build_rollup(
    df: DataFrame,
    keys: "list[str]",
    measures: "list[tuple[str, str, str]]",
) -> DataFrame:
    """Aggregate raw rows into rollup STATE. ``measures`` is a list of
    ``(out_name, kind, source_column)`` with kind in count/sum/min/max
    (count ignores the source column). Unknown kinds raise — the
    non-algebraic cases must not slip through."""
    aggs = []
    for out, kind, col in measures:
        if kind not in _KINDS:
            raise ValueError(
                f"{kind!r} is not an algebraic aggregate; "
                "use a mergeable sketch for it"
            )
        aggs.append(_KINDS[kind][0](col).alias(out))
    return df.groupBy(*keys).agg(*aggs)


def merge_rollup(
    prev: DataFrame,
    delta: DataFrame,
    keys: "list[str]",
    measures: "list[tuple[str, str, str]]",
) -> DataFrame:
    """Merge two rollup states (same schema) into the state of the
    union — one unionByName + one keyed partial agg."""
    combs = []
    for out, kind, _ in measures:
        if kind not in _KINDS:
            raise ValueError(f"{kind!r} is not an algebraic aggregate")
        combs.append(_KINDS[kind][1](out).alias(out))
    return prev.unionByName(delta).groupBy(*keys).agg(*combs)


def restatement_plan(
    state_keys: DataFrame,
    late: DataFrame,
    partition_col: str = "day",
    key_col: str = "key",
) -> DataFrame:
    """Late-data restatement planning — BEFORE merging a late-arriving
    batch into a partitioned aggregate, list exactly which partitions
    it touches and how hard: the merge-on-read planner's input (which
    files to rewrite, how much reshuffle the restatement costs) and
    the report a backfill operator reads before deciding
    full-recompute vs incremental :func:`merge_rollup`. Without this,
    a one-row late event costs a full-table rewrite; with it, the
    blast radius is measured, not assumed.

    One partial agg of the late batch to partition grain, one left
    join onto the state's partition list (late partitions ABSENT from
    state are flagged ``is_new_partition`` — appends, not rewrites).
    Exact counts; the report is partitions-sized.

    Output: ``(partition, n_late_rows, n_late_keys,
    is_new_partition)``.
    """
    d = late.groupBy(F.col(partition_col).alias("partition")).agg(
        F.count(F.lit(1)).alias("n_late_rows"),
        F.count_distinct(F.col(key_col)).alias("n_late_keys"),
    )
    s = state_keys.select(
        F.col(partition_col).alias("partition")
    ).distinct().withColumn("__present", F.lit(True))
    return d.join(s, "partition", "left").select(
        "partition",
        "n_late_rows",
        "n_late_keys",
        F.coalesce(~F.col("__present"), F.lit(True)).alias(
            "is_new_partition"
        ),
    )
