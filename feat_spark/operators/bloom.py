"""Bloom-pruned semi join — cut the big side's shuffle bytes BEFORE
the exact join.

The 100 TB problem: ``big LEFT SEMI JOIN small ON key`` where ``small``
is too large to broadcast as a hash relation but its key set still
fits a few KB of bits. A sort-merge semi join shuffles EVERY big-side
row; yet most rows miss. The classic answer (runtime filters in
Spark's own optimizer, Bloom joins in every warehouse engine) is to
ship a Bloom filter of the small side's keys to the scan and drop
misses map-side — the shuffle then carries only probable hits.

Spark's built-in runtime Bloom injection is planner-internal and not
SQL-addressable (``bloom_filter_agg`` is unregistered in 4.1), so the
operator builds the filter RELATIONALLY from public primitives:

* k positions per key via seeded ``xxhash64(key, seed)`` (JVM,
  codegen) mod ``m`` bits;
* one ``bit_or`` partial agg keyed by 64-bit word index — the build
  side reduces map-side to ≤ ``m/64`` rows before its (tiny) shuffle;
* the ≤ ``m/64`` set words collect to the driver (a few KB — the same
  driver-legitimate class as centroid frames) into a dense literal
  array folded into the big side's scan filter: ``element_at`` + bit
  test per seed, whole-stage codegen, NO join, NO Python.

False positives are then removed by an exact LEFT SEMI against the
(already-small) distinct key set, so the RESULT is exactly the semi
join — the oracle gate would catch a single false NEGATIVE as a lost
row, which is precisely the property a Bloom filter must never
violate. Sizing: m bits for n keys at k hashes gives FP rate
~(1 - e^(-kn/m))^k; the default m=65536, k=3 holds ~1% at n=10k.

Lives OUTSIDE the flagship benchmark closure on purpose (see
``operators/eventops.py`` for the rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _positions(key_col: str, n_hashes: int, m_bits: int) -> list:
    """k deterministic bit positions for a key, as SQL expression
    strings: ``pmod(xxhash64(key, seed), m)``."""
    return [
        f"pmod(xxhash64({key_col}, {seed}L), {m_bits}L)"
        for seed in range(n_hashes)
    ]


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    m_bits: int = 65536,
    n_hashes: int = 3,
) -> DataFrame:
    """``big LEFT SEMI JOIN small ON key``, with a Bloom pre-filter on
    the big side so the exact join's shuffle carries only probable
    hits. Exact result (false positives verified away); the Bloom
    stage may only ever pass a superset."""
    keys = small.select(key).where(F.col(key).isNotNull()).distinct()

    # --- build: per-word bit_or over the small side -----------------
    pos_exprs = ", ".join(_positions(key, n_hashes, m_bits))
    words = (
        keys.select(F.expr(f"explode(array({pos_exprs}))").alias("__pos"))
        .select(
            F.expr("__pos div 64").alias("__w"),
            F.expr("shiftleft(1L, cast(__pos % 64 as int))").alias("__b"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__b").alias("__bits"))
        .collect()
    )
    dense = [0] * (m_bits // 64)
    for r in words:
        dense[int(r["__w"])] = int(r["__bits"])
    bloom = F.lit(dense)  # array<bigint> literal, a few KB

    # --- probe: codegen bit tests folded into the big-side scan -----
    hit = None
    for pos in _positions(key, n_hashes, m_bits):
        word = F.element_at(bloom, F.expr(f"cast(({pos}) div 64 as int)") + 1)
        bit = F.expr(f"shiftleft(1L, cast(({pos}) % 64 as int))")
        test = word.bitwiseAND(bit) != 0
        hit = test if hit is None else (hit & test)
    pruned = big.where(F.col(key).isNotNull() & hit)

    # --- exact verify: false positives out, result == semi join -----
    return pruned.join(keys, key, "left_semi")
