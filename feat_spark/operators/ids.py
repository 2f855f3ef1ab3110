"""Distributed sequential id assignment — the global ROW_NUMBER that
does not funnel the table through one reducer.

``row_number() OVER (ORDER BY key)`` is the classic single-node trap:
an empty ``partitionBy`` collapses the whole table into ONE task (Spark
even warns). At 100 TB that task never finishes. The distributed form
is the two-phase rank every MPP engine uses internally:

1. **coarse range bucket** from driver-scalar ``min``/``max`` of the
   (unique, orderable) key — ``bucket = (key - min) div width``, the
   same deterministic device as ``operators/profile.py``'s histogram
   (NOT ``repartitionByRange``, whose sampled boundaries are not
   replayable cross-engine);
2. **per-bucket counts** → a bucket-count frame (rows = n_buckets, a
   metadata-sized table) → cumulative offsets by a window over THAT
   tiny frame — the only "global" sort touches n_buckets rows;
3. offsets **broadcast-join** back, ``id = offset + local_rank - 1``
   with the local rank a per-bucket window (one hash exchange on
   ``bucket``, parallel across buckets).

Total cost: one scan + one 2-column agg + one broadcast join + one
bucket-keyed exchange — vs. the naive plan's single-partition sort of
every row. Value-skewed keys make uneven buckets (documented histogram
caveat); ids remain CORRECT regardless, only balance suffers, and a
pathological key distribution is answered by raising ``n_buckets``.

Contract: ``key_col`` must be globally unique (ties spanning a bucket
boundary would otherwise order arbitrarily). The unique-key form is
what id backfills and training-corpus row stamping actually need.

Lives OUTSIDE the flagship benchmark closure on purpose (see
``operators/eventops.py`` for the rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_sequential_ids(
    df: DataFrame,
    key_col: str,
    id_col: str = "row_id",
    n_buckets: int = 256,
) -> DataFrame:
    """Add dense ``id_col`` = 0..n-1 in ``key_col`` order, without a
    global single-partition sort. ``key_col`` must be an integral,
    globally unique column."""
    lo_hi = df.agg(
        F.min(key_col).alias("lo"), F.max(key_col).alias("hi")
    ).first()
    if lo_hi.lo is None:
        return df.withColumn(id_col, F.lit(None).cast("long"))
    lo, hi = int(lo_hi.lo), int(lo_hi.hi)
    width = max(1, (hi - lo) // int(n_buckets) + 1)

    bucketed = df.withColumn(
        "__bkt", ((F.col(key_col) - F.lit(lo)) / F.lit(width)).cast("long")
    )
    # metadata-sized frame: one row per non-empty bucket
    offsets = (
        bucketed.groupBy("__bkt")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn(
            "__offset",
            F.sum("__n").over(
                Window.orderBy("__bkt").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
        )
        .fillna({"__offset": 0})
        .drop("__n")
    )
    local = Window.partitionBy("__bkt").orderBy(key_col)
    return (
        bucketed.join(F.broadcast(offsets), "__bkt")
        .withColumn(
            id_col,
            (F.col("__offset") + F.row_number().over(local) - 1).cast("long"),
        )
        .drop("__bkt", "__offset")
    )


def rendezvous_assign(
    df: DataFrame,
    key_col: str,
    shards: "list[str]",
    out_col: str = "shard",
) -> DataFrame:
    """Rendezvous (highest-random-weight) hashing — assign every key a
    shard such that adding or removing ONE shard moves only ~1/N of
    the keys (mod-N hashing reshuffles almost everything): the
    placement primitive under shard routing, cache partitioning, and
    sticky A/B bucketing.

    Per key, each shard scores ``md5(key || chr(1) || shard)`` and the
    lexicographically largest hex digest wins — md5 (not xxhash64) on
    purpose: it is the engine-portable hash this repo uses wherever an
    external system must replay the choice bit-for-bit (DuckDB has
    md5; Spark's xxhash64 exists nowhere else). The argmax folds the
    shard list into ONE ``greatest`` over (digest, shard) structs —
    scan-only, zero shuffle, zero joins, whole-stage codegen; the
    shard list is a literal fold, the same k <= ~10^3 regime as the
    centroid-literal path in ``operators/similarity.py`` (shard counts
    are configuration-sized by nature).

    The minimal-movement property is the test contract: re-assigning
    against ``shards + [new]`` changes only keys whose new winner IS
    ``new`` — every other key's pairwise scores are untouched.
    """
    sep = "\x01"  # cannot appear in sane shard names or stringified keys
    skey = F.col(key_col).cast("string")
    scored = [
        F.struct(
            F.md5(F.concat(skey, F.lit(sep + s))).alias("w"),
            F.lit(s).alias("s"),
        )
        for s in shards
    ]
    winner = scored[0] if len(scored) == 1 else F.greatest(*scored)
    return df.withColumn(out_col, winner["s"])
