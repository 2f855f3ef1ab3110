"""Data-layout planning over file manifests (compaction / binpack).

Lives OUTSIDE sources/io.py deliberately: io.py is part of the
flagship benchmark closure (tools/bench_scaling.py hashes it to gate
published scaling rows), and additive planners must not churn that
hash. Operates on MANIFEST frames (path, partition, bytes) — the data
files themselves are never read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def compaction_plan(
    manifest: DataFrame,
    partition_cols: "list[str] | str",
    file_col: str = "path",
    bytes_col: str = "bytes",
    target_bytes: int = 512 * 1024 * 1024,
) -> DataFrame:
    """Small-file compaction planner — assign every data file to an
    output bin of ~``target_bytes`` within its partition, the planning
    step behind Iceberg/Delta ``binpack`` rewrites. Small files are
    THE silent 100 TB killer (a 100k-file partition costs 100k scan
    tasks and 100k metadata rows), and the planner itself must not
    become a driver loop over the manifest — so the assignment is
    expressed relationally: files ordered deterministically inside
    each partition (bytes DESC, then file id — big files first packs
    tighter), a running prefix sum, and
    ``bin = (cumulative - bytes) div target`` — sequential first-fit.
    One window sort per partition key over a MANIFEST-sized frame
    (millions of rows, not data rows); the data files themselves are
    never read.

    Bins can overshoot ``target_bytes`` by at most one file (the
    straddling file lands in the bin its prefix starts in) and only
    the partition's last bin can run under — the same guarantee the
    binpack strategy documents. Files >= target get a bin of their
    own by construction. All-integer arithmetic.

    Output: partition cols + ``(file, bytes, bin, bin_files,
    bin_bytes)`` — the per-bin stats ride along for the rewrite
    scheduler.
    """
    parts = (
        [partition_cols] if isinstance(partition_cols, str)
        else list(partition_cols)
    )
    w = Window.partitionBy(*parts).orderBy(
        F.col("bytes").desc(), F.col(file_col).asc()
    )
    cum = F.sum("bytes").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    planned = (
        manifest.select(
            *parts, file_col, F.col(bytes_col).cast("long").alias("bytes")
        )
        .withColumn("__cum", cum)
        .withColumn(
            "bin",
            F.expr(f"(__cum - bytes) div {int(target_bytes)}"),
        )
    )
    wb = Window.partitionBy(*parts, "bin")
    return planned.select(
        *parts,
        file_col,
        "bytes",
        "bin",
        F.count(F.lit(1)).over(wb).alias("bin_files"),
        F.sum("bytes").over(wb).alias("bin_bytes"),
    )
