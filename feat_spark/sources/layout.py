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


def zorder_key(
    df: DataFrame,
    col_x: str,
    col_y: str,
    bits: int = 16,
    out_col: str = "zkey",
) -> DataFrame:
    """Morton / Z-order interleaved sort key over two integer columns
    — the multi-dimensional clustering device behind Delta ``OPTIMIZE
    ZORDER BY`` and Iceberg's sort orders: sorting by the interleaved
    bits co-locates rows that are close in BOTH dimensions, so min/max
    file statistics prune on either predicate column
    (:func:`prune_files` is the consumer). One range-partitioned sort
    by ``zkey`` at write time buys two-column file skipping forever.

    The key is a closed-form integer expression — ``bits`` pairs of
    shift/mask/or terms unrolled into one codegen'd projection, zero
    UDF, zero shuffle (the SORT that uses it shuffles; the key does
    not). Inputs must already be non-negative ints below ``2**bits``
    (quantile-rank or bin them first — layout wants rank space, not
    raw value space, exactly what ``rank_normalize``/``quantile_bin``
    produce).
    """
    x, y = F.col(col_x).cast("long"), F.col(col_y).cast("long")
    one = F.lit(1).cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(one), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(one), 2 * i + 1)
        )
    return df.withColumn(out_col, key)


def prune_files(
    manifest: DataFrame,
    stat_lo_col: str,
    stat_hi_col: str,
    lo,
    hi,
    bytes_col: str = "bytes",
) -> DataFrame:
    """Min/max-statistics file skipping — the manifest-level planning
    step every lakehouse scan runs before touching data: a file whose
    ``[stat_lo, stat_hi]`` range is disjoint from the predicate range
    ``[lo, hi]`` cannot contain a matching row and is skipped without
    a read. This operator makes the decision AUDITABLE: it returns the
    manifest annotated with the keep/skip verdict so layout work
    (:func:`compaction_plan`, :func:`zorder_key`) can be scored by how
    many bytes it actually saves.

    Pure manifest-sized projection — one boolean interval-overlap
    expression per file, no shuffle, data files never read. NULL stats
    (a file with no min/max for the column) are conservatively KEPT —
    skipping on missing evidence is how engines corrupt results.

    Output: manifest columns + ``(keep, skipped_bytes)`` where
    ``skipped_bytes`` is ``bytes`` for skipped files else 0 (sum it
    for the savings readout).
    """
    overlap = (F.col(stat_lo_col) <= F.lit(hi)) & (
        F.col(stat_hi_col) >= F.lit(lo)
    )
    keep = F.coalesce(overlap, F.lit(True))
    return manifest.withColumn("keep", keep).withColumn(
        "skipped_bytes",
        F.when(~F.col("keep"), F.col(bytes_col)).otherwise(F.lit(0)),
    )


def read_jsonl(
    spark,
    path: str,
    schema: str,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Schema-first JSONL (newline-delimited JSON) source with
    corrupt-line accounting — the file-level twin of
    ``operators/semistructured.py::parse_json_column``: the declared
    schema is REQUIRED (schema inference triggers a full extra pass
    over the data and freezes whatever the sample happened to contain
    — never acceptable at 100 TB), and unparseable lines surface in
    ``corrupt_col`` instead of vanishing, so ingest can count and
    quarantine them.

    The scan stays JVM-side Jackson with column pruning into the JSON
    parser (Spark prunes unneeded fields at parse time); a missing
    key is a NULL column, a corrupt line is a row with every data
    column NULL and the raw text in ``corrupt_col``.
    """
    aug = schema + f", {corrupt_col} string"
    return (
        spark.read.schema(aug)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def vacuum_plan(
    manifest: DataFrame,
    keep_last: int = 3,
    snap_col: str = "snapshot_id",
    file_col: str = "path",
) -> DataFrame:
    """Snapshot-expiry vacuum planning — which data files become
    deletable when all but the last ``keep_last`` snapshots expire:
    Iceberg's ``expireSnapshots`` decision, relationally. A file dies
    only if NO retained snapshot still references it — the
    reference-counting rule whose naive per-snapshot loop version is
    how people delete live data.

    Manifest rows are (snapshot, file) references. Retained snapshot
    ids = the ``keep_last`` largest (snapshot ids must be ordered —
    true of every table format's sequence numbers); that cut is a
    TakeOrdered over DISTINCT snapshot ids (snapshot-count-sized), and
    deletable = files of expired snapshots ANTI-joined against files
    of retained ones. Manifest-scale only; data files never read.

    Output: one row per deletable file ``(file, n_expired_refs,
    last_snapshot)`` — last_snapshot says how stale the file is.
    """
    snaps = manifest.select(F.col(snap_col).alias("s")).distinct()
    kept = snaps.orderBy(F.col("s").desc()).limit(keep_last)
    refs = manifest.select(
        F.col(snap_col).alias("s"), F.col(file_col).alias("f")
    )
    live = refs.join(F.broadcast(kept), "s", "left_semi").select("f").distinct()
    expired = refs.join(F.broadcast(kept), "s", "left_anti")
    return (
        expired.join(live, expired["f"] == live["f"], "left_anti")
        .groupBy(expired["f"].alias(file_col))
        .agg(
            F.count(F.lit(1)).alias("n_expired_refs"),
            F.max("s").alias("last_snapshot"),
        )
    )


def time_travel_plan(
    changelog: DataFrame,
    snapshot: int,
    snap_col: str = "snapshot_id",
    file_col: str = "path",
    op_col: str = "op",
    add_op: str = "add",
) -> DataFrame:
    """Time-travel read planning — which data files a query AS OF
    ``snapshot`` must scan, from an add/remove change log: the
    log-replay decision under Iceberg/Delta ``VERSION AS OF``,
    relationally. A file is visible iff its LATEST action at or
    before the snapshot is an add.

    One filter (``snapshot_id <= snapshot`` — monotone ids, the same
    contract as :func:`vacuum_plan`) + one per-file argmax by
    snapshot id (map-side-combinable ``max(struct(snap, op))``, no
    window sort) + one predicate. Manifest-scale only; data files
    never read. At most one action per (snapshot, file) by contract —
    table formats serialize commits.

    Output: ``(path, added_at)`` — the visible files and the snapshot
    of their last add.
    """
    upto = changelog.filter(F.col(snap_col) <= snapshot).select(
        F.col(file_col).alias("path"),
        F.struct(
            F.col(snap_col).cast("long").alias("s"), F.col(op_col).alias("o")
        ).alias("__act"),
    )
    last = upto.groupBy("path").agg(F.max("__act").alias("__last"))
    return last.filter(F.col("__last")["o"] == add_op).select(
        "path", F.col("__last")["s"].alias("added_at")
    )


def read_parquet_evolved(spark, path: str):
    """Schema-evolution-tolerant parquet read — ``mergeSchema`` union
    of every file's footer schema, so a table whose writer ADDED
    columns over time (the normal life of a 100 TB event log) reads as
    ONE frame with the superset schema and NULLs where old files
    predate a column. This is the read-side half of the evolution
    story (the write side is append-only with additive columns — the
    Iceberg-ready seam in ``sources/io.py`` fences the full metadata
    path).

    Scale note: ``mergeSchema`` reads every footer at planning time —
    at 10^6 files that's the planner's cost, not the executors'; real
    deployments pin the merged schema in a catalog and pass it
    explicitly. The operator exists to make the EVOLVED-read semantics
    (superset columns, NULL backfill, no reorder surprises) a tested
    contract rather than an assumption.
    """
    return spark.read.option("mergeSchema", "true").parquet(path)
