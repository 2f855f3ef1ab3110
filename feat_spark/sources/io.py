"""Storage seam: Iceberg at scale, plain parquet in the sandbox.

The reference library does no I/O at all (pure in-memory Erlang —
SURVEY.md §2.5); every source/sink here is mandated by the north rule
(Iceberg transcript tables, feature-table sink, checkpoint manifest).

Design for 100 TB:
* reads go through ``read_table`` so partition pruning / pushdown rules
  live in one place;
* writes go through ``write_table`` which partitions by a bucketed
  ``conv_id`` (hidden partitioning on Iceberg; explicit
  ``bucket`` column on parquet) so downstream as-of joins and windows
  shuffle-align for free;
* the Iceberg catalog is attempted first and parquet is the sandbox
  fallback — no code outside this module knows which one is active.

TESTED CLAIM BOUNDARY: no Iceberg runtime jar exists in this
environment (and no network to fetch one), so the Iceberg branch of
this seam has NEVER been executed here — every test, oracle row and
benchmark runs the parquet path. What Iceberg would add (hidden
partitioning, snapshot-isolated commits, manifest-based pruning,
snapshot-id checkpoint resume in plans/checkpoint.py) is design intent
expressed at this seam, not a verified behavior. A deployment enabling
it must run tests/test_checkpoint.py against a real catalog first.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Known test tables (TESTDATA.md) — one parquet file per table.
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is on the classpath+configured."""
    try:
        jvm = spark._jvm  # noqa: SLF001 - capability probe only
        jvm.java.lang.Class.forName("org.apache.iceberg.catalog.Catalog")
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one named table.

    ``sf_dir`` may be a directory of ``{name}.parquet`` files (the
    sandbox layout) or an Iceberg namespace ``catalog.db`` (at scale).
    """
    if "/" not in sf_dir and iceberg_available(spark):
        return spark.read.format("iceberg").load(f"{sf_dir}.{name}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if not os.path.exists(path):
        # directory-style parquet dataset written by write_table
        alt = os.path.join(sf_dir, name)
        if os.path.exists(alt):
            path = alt
    return spark.read.parquet(path)


def write_table(
    df: DataFrame,
    target: str,
    mode: str = "overwrite",
    bucket_col: str | None = "conv_id",
    n_buckets: int = 32,
) -> None:
    """Write a feature/transcript table.

    At scale this is ``df.writeTo(tbl).append()`` against Iceberg with
    hidden ``bucket(conv_id), days(ts)`` partitioning; the parquet
    fallback materializes the bucket as an explicit partition column so
    the on-disk layout still clusters conversations.
    """
    spark = df.sparkSession
    if "/" not in target and iceberg_available(spark):
        writer = df.writeTo(target)
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    if bucket_col and bucket_col in df.columns:
        df = df.withColumn("_bucket", F.pmod(F.xxhash64(F.col(bucket_col)), F.lit(n_buckets)))
        df.write.mode(mode).partitionBy("_bucket").parquet(target)
    else:
        df.write.mode(mode).parquet(target)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    path: str,
    bucket_col: str = "conv_id",
    n_buckets: int = 32,
    sort_cols: tuple = (),
    mode: str = "overwrite",
) -> None:
    """Write a CATALOG bucketed table (``bucketBy`` + optional
    ``sortBy``) — the device that makes repeated big-to-big joins and
    aggregations on ``bucket_col`` shuffle-free: two tables bucketed
    by the same key into the same bucket count join with ZERO Exchange
    (and with ``sortBy``, zero Sort) because the on-disk layout
    already satisfies the join's required distribution.

    This is the parquet-catalog twin of Iceberg's hidden
    ``bucket(N, col)`` partition transform named by the north rule —
    write once, co-locate every downstream join/agg forever. The
    shuffle-free join is asserted by plan in
    tests/test_checkpoint.py::test_bucketed_join_is_shuffle_free.
    """
    writer = df.write.mode(mode).option("path", path).bucketBy(
        n_buckets, bucket_col
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)
