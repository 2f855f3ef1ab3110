"""Deterministic hash-based sampling — the reproducible way to cut a
100 TB corpus down to a training/eval slice.

``df.sample()`` is seeded per-partition and changes with the physical
layout (file order, splits, repartition), so two runs over the same
LOGICAL data can sample different rows. Hash-gating on a stable key
(``pmod(h(key), 100) < pct``) is layout-independent, join-stable
(the same id is in or out everywhere, forever), pushes down as an
ordinary filter, and an external engine can replay it bit-for-bit —
the property every data-lineage audit eventually asks for.

The hash is the portable ``md5_long32`` (Spark md5 == DuckDB md5), so
the driver oracle checks the SAMPLED SET itself, not just its size.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from feat_spark.functions.text import md5_long32


def _gate(key: Column, salt: str) -> Column:
    """Uniform [0,100) hash gate on (salt, key)."""
    return F.pmod(md5_long32(F.concat_ws(":", F.lit(salt), key.cast("string"))), F.lit(100))


def hash_sample(
    df: DataFrame, key: str, pct: int, salt: str = "s"
) -> DataFrame:
    """Keep ~``pct``% of rows, chosen by a stable hash of ``key``.
    ``salt`` decorrelates independent samples over the same key space
    (eval vs train splits: different salts, disjoint-ish gates)."""
    return df.filter(_gate(F.col(key), salt) < pct)


def stratified_hash_sample(
    df: DataFrame,
    strata: str,
    key: str,
    rates: Mapping[str, int],
    default_pct: int = 0,
    salt: str = "s",
) -> DataFrame:
    """Per-stratum rates (e.g. downsample boilerplate-heavy sources,
    keep all rare ones): ``{stratum_value: pct}``; unlisted strata get
    ``default_pct``. One narrow filter — no shuffle, no per-stratum
    passes."""
    rate = F.lit(default_pct)
    for value, pct in sorted(rates.items()):
        rate = F.when(F.col(strata) == value, F.lit(pct)).otherwise(rate)
    return df.filter(_gate(F.col(key), salt) < rate)
