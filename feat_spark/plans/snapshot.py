"""Snapshot diff — row-level change detection between two versions of
a dataset (yesterday's curated corpus vs today's, a backfill vs the
table it replaces).

This is the reference's diff semantics lifted from one nested value to
a whole table: ``feat.erl`` compares two feature maps and reports the
set of differing paths (``/root/reference/src/feat.erl:128-141``
``compare/2``, ``:326-353`` ``list_diff_fields/2``); here two RELATIONS
are compared and each changed row reports the set of differing columns
— same contract, table-shaped.

Plan: one null-safe full-outer equi-join on the key, per-column
``IS DISTINCT FROM`` predicates (NULL-aware, like the reference's
undefined-vs-value asymmetry handling), and a filter that drops
identical rows BEFORE anything is materialized — at 100 TB the output
is the (small) delta, never the corpus. Comparisons happen
column-by-column in codegen, not via a serialized row hash, so no
cross-engine string-rendering hazard enters the plan.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """``(key..., status, changed_cols)`` with status in
    ``{'added','removed','changed'}``; unchanged rows are dropped.

    ``changed_cols`` lists the differing column names (in
    ``compare_cols`` order) for ``changed`` rows and is an empty array
    for added/removed rows — presence is the row-level diff, the array
    is the column-level one (the ``list_diff_fields`` analogue).

    ``compare_cols`` defaults to every shared non-key column. The join
    is null-safe on every key column: a NULL key names a real row, it
    does not wildcard-match (the same rule the group-cap/impute
    operators adopted for NULL groups).
    """
    if compare_cols is None:
        keys = set(key_cols)
        compare_cols = [
            c for c in old.columns if c in set(new.columns) and c not in keys
        ]
    cond = None
    for k in key_cols:
        c: Column = F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
        cond = c if cond is None else cond & c
    # presence probes: keys may legitimately be NULL, so side presence
    # is a constant tagged onto each side, not a key-null check
    o_hit = F.col("o.__present").isNotNull()
    n_hit = F.col("n.__present").isNotNull()
    diffs = [
        F.when(
            ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")), F.lit(c)
        )
        for c in compare_cols
    ]
    changed_cols = F.filter(F.array(*diffs), lambda x: x.isNotNull())
    status = (
        F.when(~o_hit, F.lit("added"))
        .when(~n_hit, F.lit("removed"))
        .when(F.size(changed_cols) > 0, F.lit("changed"))
    )
    out_keys = [
        F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in key_cols
    ]
    return (
        old.withColumn("__present", F.lit(1))
        .alias("o")
        .join(new.withColumn("__present", F.lit(1)).alias("n"), cond, "full_outer")
        .select(
            *out_keys,
            status.alias("status"),
            F.when(status == "changed", changed_cols)
            .otherwise(F.array().cast("array<string>"))
            .alias("changed_cols"),
        )
        .filter(F.col("status").isNotNull())
    )


def scd2_build(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Collapse an append-only change log into SCD-2 validity
    intervals — the dimension-table builder every feature store needs
    (point-in-time joins consume its output via the as-of family).

    Input: one row per observation ``(key, ts, attrs...)``. Output:
    one row per RUN of consecutive identical attribute tuples per key:
    ``(key, attrs..., valid_from, valid_to, version, is_current)``
    with ``valid_to`` = next run's ``valid_from`` (NULL on the last —
    the half-open convention), ``version`` = 1-based run index.

    Shape: ONE shuffle (hash by key), then three window passes over
    the same (key × order) sort — Catalyst reuses the single sort; no
    self-join, no collect. The run detector is the classic
    gaps-and-islands running-sum-of-change-flags, with NULL-safe
    change tests (``eqNullSafe``) so a NULL->value attribute flip
    opens a new version, same NULL discipline as the reference's
    undefined-vs-value compare (/root/reference/src/feat.erl:278-289).
    All outputs are input values or integer counters — bit-stable
    cross-engine.
    """
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col is not None else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    changed = F.lit(False)
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(F.col(a)).over(w))
    # first row of each key: lag is null on every attr -> eqNullSafe
    # false unless attr is null too; force a new run explicitly
    first = F.row_number().over(w) == 1
    runs = df.withColumn(
        "__ver",
        F.sum(F.when(first | changed, 1).otherwise(0)).over(w),
    )
    grouped = runs.groupBy(F.col(key_col), F.col("__ver")).agg(
        *[F.first(a).alias(a) for a in attr_cols],
        F.min(ts_col).alias("valid_from"),
    )
    wv = Window.partitionBy(key_col).orderBy("__ver")
    return grouped.select(
        F.col(key_col),
        *[F.col(a) for a in attr_cols],
        F.col("valid_from"),
        F.lead("valid_from").over(wv).alias("valid_to"),
        F.col("__ver").cast("long").alias("version"),
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
    )


def upsert_latest(
    base: DataFrame,
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    op_col: str | None = None,
    delete_op: str = "D",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Type-1 CDC compaction — apply a change stream onto a base
    snapshot, latest-wins per key, honoring deletes: the MERGE INTO /
    upsert semantics (:func:`scd2_build`'s type-2 sibling keeps every
    version; this keeps ONE current row per key, the table-maintenance
    primitive for ingesting transcript corrections or dimension feeds
    without a transactional table format).

    Base rows rank strictly BELOW every change for the same key (a
    change at any ts supersedes the snapshot it diffs against — the
    CDC convention; base timestamps are lineage, not recency), and
    among changes recency wins: latest ``ts`` (then ``tiebreak_col``,
    then changes-over-base) takes the key. If the winner's ``op_col``
    equals ``delete_op`` the key is dropped from the output.

    Shape: union + ONE hash shuffle by key + one window row_number —
    versions-per-key bounds the per-partition sort, and a hot key is
    bounded by its own change count, not corpus size (compact change
    batches upstream if one key receives millions of changes). No
    join at all: the base is just the rank-0 layer of the union —
    cheaper than the MERGE-style outer join and identical semantics
    when the whole base is eligible. Output columns = base columns;
    all values pass through untouched — bit-stable by construction.
    """
    cols = base.columns
    extra = [c for c in (op_col, tiebreak_col) if c is not None and c not in cols]
    layer_b = base.select(*cols).withColumn("__layer", F.lit(0))
    layer_c = changes.select(*cols, *extra).withColumn("__layer", F.lit(1))
    for c in extra:
        # base rows lack the change-feed-only columns (op, sequence
        # number); a typed NULL keeps the union schema aligned
        layer_b = layer_b.withColumn(
            c, F.lit(None).cast(dict(changes.dtypes)[c])
        )
    if op_col is None:
        layer_b = layer_b.withColumn("__op", F.lit(None).cast("string"))
        layer_c = layer_c.withColumn("__op", F.lit(None).cast("string"))
    else:
        layer_b = layer_b.withColumnRenamed(op_col, "__op")
        layer_c = layer_c.withColumnRenamed(op_col, "__op")
    u = layer_b.unionByName(layer_c)
    order = [F.desc("__layer"), F.desc(ts_col)] + (
        [F.desc(tiebreak_col)] if tiebreak_col is not None else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    winner = u.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    )
    survivors = winner.filter(
        F.col("__op").isNull() | (F.col("__op") != F.lit(delete_op))
    )
    return survivors.select(*cols)
