"""Per-partition watermark checkpointing + exactly-once resume
(north rule: "checkpoints per-partition watermarks to an Iceberg
manifest for exactly-once resume"; BASELINE.json:6,14).

Unit of work = a conv_id *bucket* (``lineage.with_bucket``): the same
deterministic hash that lays the table out on disk. The manifest is a
tiny append-only table, one row per completed bucket per run:

    (bucket:int, watermark_ts, rows_out:long, wall_sec, run_id)

Exactly-once protocol (sandbox parquet; Iceberg at scale — the write
and the manifest append become ONE atomic snapshot commit there):

1. completed = manifest.completed_buckets()
2. todo = source buckets ANTI-JOIN completed      (cheap, driver-side)
3. features(todo) written with dynamic partition overwrite on
   ``_bucket`` — re-running a half-finished bucket REPLACES its
   partition directory instead of duplicating rows (idempotent).
4. manifest.commit(per-bucket stats) — atomic file move, written only
   AFTER the data lands. A crash between 3 and 4 re-runs the bucket;
   step 3's overwrite makes that harmless. Hence: effectively-once.

The watermark per bucket (max ts successfully featurized) is what a
streaming-ish incremental run consumes: new source rows with
``ts <= watermark(bucket)`` are already represented.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from feat_spark.plans.lineage import BUCKET_COL, Stopwatch, with_bucket

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("watermark_ts", T.TimestampType(), True),
        T.StructField("rows_out", T.LongType(), True),
        T.StructField("wall_sec", T.DoubleType(), True),
        T.StructField("run_id", T.StringType(), True),
    ]
)


class CheckpointManifest:
    """Append-only bucket manifest. Parquet directory in the sandbox
    (atomic per-commit file moves); an Iceberg table at scale, where
    ``commit`` becomes a snapshot append."""

    def __init__(self, path: str):
        self.path = path

    def load(self, spark: SparkSession) -> DataFrame:
        if not os.path.isdir(self.path) or not any(
            f.endswith(".parquet") for f in os.listdir(self.path)
        ):
            return spark.createDataFrame([], MANIFEST_SCHEMA)
        return spark.read.schema(MANIFEST_SCHEMA).parquet(self.path)

    def completed_buckets(self, spark: SparkSession) -> list[int]:
        return [
            r["bucket"] for r in self.load(spark).select("bucket").distinct().collect()
        ]

    def commit(self, stats: DataFrame) -> None:
        """Atomically append one parquet file of bucket stats: write to
        a temp name, fsync-free rename into place (POSIX-atomic; the
        Iceberg path replaces this with a snapshot commit)."""
        import pyarrow.parquet as pq
        import pyarrow as pa

        os.makedirs(self.path, exist_ok=True)
        pdf = stats.toPandas()
        arrow_schema = pa.schema(
            [
                pa.field("bucket", pa.int32()),
                pa.field("watermark_ts", pa.timestamp("us")),  # Spark reads us, not pandas' ns
                pa.field("rows_out", pa.int64()),
                pa.field("wall_sec", pa.float64()),
                pa.field("run_id", pa.string()),
            ]
        )
        tmp = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}")
        final = os.path.join(self.path, f"commit-{uuid.uuid4().hex}.parquet")
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=arrow_schema, preserve_index=False), tmp
        )
        os.rename(tmp, final)


def run_with_resume(
    spark: SparkSession,
    source: DataFrame,
    pipeline,
    manifest: CheckpointManifest,
    sink_path: str,
    key: str = "conv_id",
    ts_col: str = "ts",
    n_buckets: int = 32,
) -> dict:
    """Run ``pipeline`` over the un-checkpointed buckets of ``source``,
    write features partitioned by bucket, commit per-bucket watermarks.

    Returns run metrics ``{buckets_done, buckets_skipped, rows,
    wall_sec, rows_per_sec}``. Calling it again after ANY interruption
    (or after completion) processes only what the manifest lacks.
    ``pipeline`` must be key-local (features of a conversation depend
    only on that conversation's rows) — true for every operator in this
    engine — so per-bucket processing is semantically invisible.
    """
    sw = Stopwatch()
    run_id = uuid.uuid4().hex
    bucketed = with_bucket(source, key, n_buckets)
    done = manifest.completed_buckets(spark)

    todo = bucketed
    if done:
        todo = bucketed.filter(~F.col(BUCKET_COL).isin(done))
    n_rows = todo.count()
    if n_rows == 0:
        return {
            "buckets_done": 0,
            "buckets_skipped": len(done),
            "rows": 0,
            "wall_sec": 0.0,
            "rows_per_sec": None,
        }

    feats = pipeline(todo)
    if BUCKET_COL not in feats.columns:
        raise ValueError("pipeline must preserve the bucket column")

    # Idempotent data write: only the touched bucket partitions are
    # replaced; completed buckets' directories are never rewritten.
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    feats.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(sink_path)

    stats = (
        spark.read.parquet(sink_path)
        .filter(~F.col(BUCKET_COL).isin(done) if done else F.lit(True))
        .groupBy(F.col(BUCKET_COL).cast("int").alias("bucket"))
        .agg(
            F.max(ts_col).alias("watermark_ts"),
            F.count(F.lit(1)).alias("rows_out"),
        )
        .withColumn("wall_sec", F.lit(None).cast("double"))
        .withColumn("run_id", F.lit(run_id))
    )
    manifest.commit(stats)

    n_buckets_done = stats.count()
    m = sw.metrics(n_rows)
    return {
        "buckets_done": n_buckets_done,
        "buckets_skipped": len(done),
        **m,
    }
