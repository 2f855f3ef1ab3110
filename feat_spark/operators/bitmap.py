"""Bitmap (bitset) audience indexes — set algebra at word speed.

``segment_overlap`` answers "how much do these cohorts overlap" by
self-joining the membership grain: right once, expensive every time.
When overlap questions are ASKED REPEATEDLY (audience planners iterate
dozens of pair queries), warehouses keep a bitmap index instead: one
64-bit word per 64 entity ids per segment, set-intersection =
``bit_count(a AND b)`` summed over word indexes. The index is built
once (one partial agg — ``bit_or`` is commutative/associative, so
map-side combine collapses each partition to segment×words rows), and
every subsequent pair query joins WORD frames whose size is
``|entity domain| / 64`` — three orders of magnitude under the
membership grain.

Contract: entity ids must be non-negative integers; the word space is
their ``id div 64`` range (dense ids pack best — compose with
``operators/ids.assign_sequential_ids`` when the raw key is sparse).
The bitmap dedups membership by construction (bits are idempotent),
matching the DISTINCT-grain semantics of ``segment_overlap``.

Lives OUTSIDE the flagship benchmark closure on purpose (see
``operators/eventops.py`` for the rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bitmap_index(
    df: DataFrame,
    segment_col: str,
    entity_col: str,
) -> DataFrame:
    """Build the per-segment bitmap: ``(segment, word, bits)`` with
    ``word = entity div 64`` and ``bits`` the OR of the members' bit
    positions. One partial-agg pass."""
    return (
        df.select(
            F.col(segment_col).alias("segment"),
            F.expr(f"{entity_col} div 64").alias("word"),
            F.expr(f"shiftleft(1L, cast({entity_col} % 64 as int))").alias(
                "__b"
            ),
        )
        .groupBy("segment", "word")
        .agg(F.bit_or("__b").alias("bits"))
    )


def bitmap_intersect(index: DataFrame) -> DataFrame:
    """Pairwise segment intersection sizes from a :func:`bitmap_index`
    frame: join word frames, popcount the AND, sum per pair. Returns
    ``(seg_a, seg_b, n_common)`` for pairs with at least one common
    member, ``seg_a < seg_b``."""
    l = index.select(
        F.col("segment").alias("seg_a"), "word", F.col("bits").alias("ba")
    )
    r = index.select(
        F.col("segment").alias("seg_b"), "word", F.col("bits").alias("bb")
    )
    return (
        l.join(r, "word")
        .filter(F.col("seg_a") < F.col("seg_b"))
        .select(
            "seg_a",
            "seg_b",
            F.expr("bit_count(ba & bb)").cast("long").alias("__c"),
        )
        .groupBy("seg_a", "seg_b")
        .agg(F.sum("__c").alias("n_common"))
        .filter(F.col("n_common") > 0)
    )
