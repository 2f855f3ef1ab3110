"""Stable hashing.

The reference hashes every leaf with ``erlang:phash2`` — deterministic
across nodes and runs (/root/reference/src/feat.erl:459-461). The
engine-side equivalent is Spark's native ``xxhash64`` (vectorized,
codegen'd, 64-bit, seed 42). The *semantics* feat's tests rely on are
hash-algebra-independent — same value ⇒ same feature, different value ⇒
different feature — so the oracle only needs *a* stable hash, not
phash2's bit pattern (BASELINE.json north_star: "mirrors feat's
stable-hash feature vectors").

``stable_hash`` is the driver/oracle-side hash: blake2b-based, keyed by
a type tag so ``1``, ``1.0`` and ``"1"`` don't collide structurally.
``spark_leaf_hash`` is the engine-side Column expression.

``hash_lookup_via_spark`` computes engine hashes for a small set of
leaf values *through Spark itself* — the bit-for-bit-safe way to give
a pandas/pytest oracle the engine's exact hash values (SURVEY.md §7
hard part (d)).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Any, Iterable

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def stable_hash(v: Any) -> int:
    """Deterministic signed-63-bit hash of a scalar/nested term."""
    h = hashlib.blake2b(_canon_bytes(v), digest_size=8).digest()
    return struct.unpack("<q", h)[0] & 0x7FFF_FFFF_FFFF_FFFF


def _canon_bytes(v: Any) -> bytes:
    if v is None:
        return b"N"
    if isinstance(v, bool):
        return b"B" + (b"1" if v else b"0")
    if isinstance(v, int):
        return b"I" + str(v).encode()
    if isinstance(v, float):
        return b"F" + struct.pack("<d", v)
    if isinstance(v, str):
        return b"S" + v.encode("utf-8")
    if isinstance(v, bytes):
        return b"Y" + v
    if isinstance(v, list):
        return b"L" + b"".join(_canon_bytes(x) for x in v)
    if isinstance(v, dict):
        items = sorted(v.items(), key=lambda kv: str(kv[0]))
        return b"M" + b"".join(
            _canon_bytes(str(k)) + _canon_bytes(x) for k, x in items
        )
    raise TypeError(f"unhashable term: {type(v)}")


def spark_leaf_hash(col: Column) -> Column:
    """NULL-preserving xxhash64: feat maps a missing leaf to
    ``undefined`` (feat.erl:211-212), so the hash of NULL must stay
    NULL — Spark's xxhash64 would otherwise return the bare seed."""
    return F.when(col.isNull(), F.lit(None).cast("long")).otherwise(F.xxhash64(col))


def hash_lookup_via_spark(
    spark: SparkSession, values: Iterable[str]
) -> dict[str, int]:
    """Engine-exact hash values for oracle-side feature vectors."""
    vals = [(v,) for v in dict.fromkeys(values)]
    if not vals:
        return {}
    df = spark.createDataFrame(vals, schema="v string").select(
        "v", F.xxhash64("v").alias("h")
    )
    return {r["v"]: r["h"] for r in df.collect()}
