"""Per-partition lineage + metrics (north rule: "emits per-partition
lineage + rows/sec metrics"; BASELINE.json:6,14).

The reference's event stream (request_visited / key_visit / ... —
/root/reference/src/feat.erl:56-71) narrates a single request's
traversal. At 10^12 turns a per-row narration is physically impossible
(it would dwarf the data); the scale-appropriate reimagining is a
small, queryable frame of per-*partition* facts: which conv_id bucket
was processed, how many rows went in/out, how many payload fields were
missing (the `undefined` events of feat.erl:218-231), the timestamp
range covered, and throughput. One row per bucket — millions of times
smaller than the data, yet enough to answer "which slice produced
feature X and when" (the lineage question) and "where is the skew"
(the ops question).

Emission is ONE extra aggregate over the already-bucketed output —
partial aggregation makes the shuffle carry only bucket-level rows.
Global counters (rows, nulls) additionally ride ``df.observe`` so the
sink action itself reports them with ZERO extra passes.
"""

from __future__ import annotations

import time
from typing import Sequence

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

BUCKET_COL = "_bucket"


def with_bucket(
    df: DataFrame, key: str = "conv_id", n_buckets: int = 32, hash_fn=None
) -> DataFrame:
    """Deterministic, stable partition id: ``pmod(hash(key), n)`` —
    xxhash64 by default (native, the same expression bucketizes the
    Iceberg table's hidden partitioning at scale, so lineage rows align
    with storage layout). ``hash_fn`` swaps in a portable hash (e.g.
    ``functions.text.md5_long32``) when an external engine must
    reproduce the bucketing bit-for-bit (the DuckDB oracle does)."""
    h = (hash_fn or F.xxhash64)(F.col(key))
    return df.withColumn(BUCKET_COL, F.pmod(h, F.lit(n_buckets)).cast("int"))


def partition_lineage(
    out: DataFrame,
    ts_col: str = "ts",
    null_cols: Sequence[str] = (),
    bucket_col: str = BUCKET_COL,
    key: str = "conv_id",
    exact_distinct: bool = False,
) -> DataFrame:
    """Per-bucket lineage frame:
    ``(bucket, rows_out, min_ts, max_ts, n_convs, null_<c>...)``.

    ``exact_distinct`` swaps the HLL entity count for the exact one —
    pricier shuffle, used when lineage itself is oracle-checked."""
    distinct = F.countDistinct(key) if exact_distinct else F.approx_count_distinct(key)
    aggs = [
        F.count(F.lit(1)).alias("rows_out"),
        F.min(ts_col).alias("min_ts"),
        F.max(ts_col).alias("max_ts"),
        distinct.alias("n_convs"),
    ]
    for c in null_cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}"))
    return out.groupBy(bucket_col).agg(*aggs)


def observed(df: DataFrame, name: str = "lineage") -> tuple[DataFrame, Observation]:
    """Attach an Observation so the NEXT action on ``df`` reports global
    row/conv counts for free (no extra job)."""
    obs = Observation(name)
    return df.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    ), obs


class Stopwatch:
    """Wall-clock + rows/sec helper for metric emission."""

    def __init__(self) -> None:
        self.t0 = time.perf_counter()

    def metrics(self, rows: int) -> dict:
        wall = time.perf_counter() - self.t0
        return {
            "rows": rows,
            "wall_sec": round(wall, 3),
            "rows_per_sec": round(rows / wall, 1) if wall > 0 else None,
        }
