"""Salted two-phase aggregation — the skew answer for COMMUTATIVE
aggregates (north rule: "salted repartitioning for hot conversations",
BASELINE.json:6).

Skew handling in this engine comes in three flavors, by operator class:

* ordered windows  -> ``operators/chunked.py`` (order-aligned prefix
  sums; salting an ordered window would corrupt it — SURVEY.md §7c);
* as-of / joins    -> ``operators/asof.py`` ``skew_aware`` (hot-key
  isolation into a broadcast branch);
* commutative aggs -> THIS module: append a deterministic salt to the
  grouping key, aggregate ``(key, salt)`` partials, then merge partials
  per key. Both stages are hash aggregates with map-side combine; the
  first shuffle spreads a hot key over ``n_salts`` reducers instead of
  melting one.

Results are bit-identical to the unsalted aggregate for the supported
merge-able functions (sum/count/min/max — NOT avg directly: derive it
as sum/count at the end, which ``salted_group_agg`` does for you).

Note Spark's AQE skew handling does not cover aggregations (only
joins), so at 10^12-turn scale with Zipf-hot conversations this is the
difference between a stuck straggler task and an even fan-out.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"

#: partial-aggregate -> final-merge function pairs
_MERGEABLE = {
    "sum": ("sum", "sum"),
    "count": ("count", "sum"),
    "min": ("min", "min"),
    "max": ("max", "max"),
}


def _xxhash64_hashable(dt) -> bool:
    """xxhash64 raises DATATYPE_MISMATCH.HASH_MAP_TYPE on MAP (and any
    type nesting one) and cannot hash VARIANT; everything else Spark
    ships is fine."""
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _xxhash64_hashable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_xxhash64_hashable(f.dataType) for f in dt.fields)
    return dt.__class__.__name__ != "VariantType"


def salted_group_agg(
    df: DataFrame,
    keys: str | Sequence[str],
    aggs: Mapping[str, Sequence[str]],
    n_salts: int = 16,
    salt_col: str | None = None,
) -> DataFrame:
    """Group-by ``keys`` with ``{col: [fn, ...]}`` aggregates, executed
    as salt-partial + merge. Output columns ``{col}_{fn}`` (plus
    ``{col}_avg`` derived from sum/count when requested).

    ``salt_col`` defaults to ``pmod(xxhash64(<all HASHABLE non-key
    columns>), n_salts)`` — deterministic (``monotonically_increasing_id``
    would differ across task retries), and hashing every non-key column
    (not just the aggregated ones) keeps the spread alive when the
    aggregated value itself is constant or low-cardinality for a hot
    key (a flag, a repeated price): any timestamp/id column in the
    frame restores the entropy. Columns ``xxhash64`` rejects (MAP, and
    any array/struct containing one — DATATYPE_MISMATCH.HASH_MAP_TYPE)
    are excluded from the default salt; the aggregated columns are
    always present and hashable (numeric/orderable by construction), so
    the hashable set is never empty. Any spread
    is correct because the aggregate is commutative. If EVERY non-key
    column is low-cardinality, pass ``salt_col`` explicitly — the
    degenerate single-salt case silently reverts to the unsalted
    straggler this operator exists to avoid.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)

    wants_avg = {c for c, fns in aggs.items() if "avg" in fns}
    plan: dict[str, list[str]] = {}
    for c, fns in aggs.items():
        out = [f for f in fns if f != "avg"]
        if c in wants_avg:
            out += [f for f in ("sum", "count") if f not in out]
        for f in out:
            if f not in _MERGEABLE:
                raise ValueError(f"{f!r} is not salt-mergeable (use chunked/plain)")
        plan[c] = out

    # the aggregated columns are usually hashable non-key columns, but
    # not always: count() is salt-mergeable over ANY type, so a frame
    # whose only non-key column is a counted MAP leaves nothing to
    # hash. xxhash64() with zero args fails analysis with an opaque
    # error — raise the actionable one instead.
    by_name = {f.name: f.dataType for f in df.schema.fields}
    entropy_cols = [
        c
        for c in df.columns
        if c not in keys and c != _SALT and _xxhash64_hashable(by_name[c])
    ]
    if not salt_col and not entropy_cols:
        raise ValueError(
            "no xxhash64-hashable non-key column to build the default salt "
            "from (only MAP/VARIANT columns remain) — pass salt_col= with a "
            "precomputed deterministic salt"
        )
    salt = (
        F.col(salt_col)
        if salt_col
        else F.pmod(F.xxhash64(*[F.col(c) for c in entropy_cols]), F.lit(n_salts))
    )

    partial = (
        df.withColumn(_SALT, salt)
        .groupBy(*keys, _SALT)
        .agg(
            *[
                getattr(F, _MERGEABLE[fn][0])(c).alias(f"__p_{c}_{fn}")
                for c, fns in plan.items()
                for fn in fns
            ]
        )
    )
    final = partial.groupBy(*keys).agg(
        *[
            getattr(F, _MERGEABLE[fn][1])(f"__p_{c}_{fn}").alias(f"{c}_{fn}")
            for c, fns in plan.items()
            for fn in fns
        ]
    )
    for c in wants_avg:
        final = final.withColumn(c + "_avg", F.col(f"{c}_sum") / F.col(f"{c}_count"))
        final = final.drop(
            *[f"{c}_{fn}" for fn in ("sum", "count") if fn not in aggs[c]]
        )
    return final


def salt_advisor(
    df: DataFrame,
    key_col: str,
    target_rows_per_task: int = 5_000_000,
    top_k: int = 20,
) -> DataFrame:
    """Salting prescription — turn :func:`feat_spark.operators.profile
    .skew_report`'s diagnosis into the NUMBER the fix needs: for each
    of the heaviest keys, the salt factor ``ceil(n_key /
    target_rows_per_task)`` that caps every salted partition at the
    target, and whether salting is warranted at all (factor 1 keys
    ride the normal path — salting them just adds a second shuffle
    for nothing). Feed the >1 rows to :func:`salted_aggregate` /
    the as-of hot-key isolation as their hot-key list.

    One partial-agg key count, one TakeOrdered top-k (count desc, key
    asc) — the report is k rows, the driver never sees the data.
    Exact integer ceil-division.

    Output: ``(key, n_rows, salt_factor, needs_salt)``.
    """
    g = (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).cast("string").alias("key"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.col("n_rows").desc(), F.col("key").asc())
        .limit(top_k)
    )
    t = int(target_rows_per_task)
    factor = F.floor((F.col("n_rows") + t - 1) / t).cast("int")
    return g.select(
        "key",
        "n_rows",
        factor.alias("salt_factor"),
        (factor > 1).alias("needs_salt"),
    )
