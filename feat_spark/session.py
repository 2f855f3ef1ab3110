"""SparkSession factory tuned for the feature engine.

Defaults are chosen for scale-out correctness first (AQE on, skew-join
handling on, Arrow for pandas UDFs) and are safe in ``local[N]`` test
mode. On a real cluster the same settings apply; only
``shuffle_partitions`` should be raised to ~2-3x total cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# UTC everywhere: transcript `ts` columns are instants; a session-local
# timezone would silently shift window boundaries between driver and
# oracle. (The reference library has no timestamps at all — see
# SURVEY.md §1.2 — so this is a north-rule concern only.)
SESSION_TZ = "UTC"


def tuned_builder(
    master: str | None = None,
    shuffle_partitions: int | None = None,
    app_name: str = "feat_spark",
) -> SparkSession.Builder:
    """Return a builder with the engine's standard configuration.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS or *]`` so the same
    code path serves tests, bench (two parallelism levels) and
    spark-submit (where master comes from the submit command and the
    ``.master`` call is skipped).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else 32

    b = SparkSession.builder.appName(app_name)
    if master:
        b = b.master(master)
    return (
        b.config("spark.sql.session.timeZone", SESSION_TZ)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime coalescing of small shuffle partitions and
        # skew-join splitting — first line of defence for hot conv_ids.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow is the only sanctioned JVM<->Python transport
        # (BASELINE.json input_hint: "no per-row Python").
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Nested-schema pruning: only schema-mentioned payload paths are
        # read — the Spark analogue of feat's column-pruning-by-
        # construction (/root/reference/src/feat.erl:181-191).
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        # G1's GCLocker stalls collapse throughput above ~16 runner
        # threads in one JVM (measured: local[32] slower than local[8]
        # with the default heap). Generational ZGC removes the stall and
        # restores monotone core scaling; on a real multi-executor
        # cluster each executor JVM is smaller and either collector works.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_GC_OPTS", "-XX:+UseZGC -XX:+ZGenerational"),
        )
    )


def get_spark(
    master: str | None = None,
    shuffle_partitions: int | None = None,
    app_name: str = "feat_spark",
) -> SparkSession:
    """Create (or fetch the active) tuned SparkSession."""
    spark = tuned_builder(master, shuffle_partitions, app_name).getOrCreate()
    ship_package(spark)
    return spark


def ship_package(spark: SparkSession) -> None:
    """Make ``feat_spark`` importable on executor Python workers.

    Zips the package once and ``addPyFile``s it — the programmatic twin
    of ``spark-submit --py-files feat_spark.zip`` (BASELINE.json:6
    packaging requirement). Without this, any pandas-UDF closure that
    references the package fails with ModuleNotFoundError as soon as
    the driver's cwd isn't the repo root (true on a real cluster
    always; observed locally when launching from another directory).
    """
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if not os.path.isdir(pkg_dir):
        # imported from a zip: spark-submit --py-files already shipped us
        return
    stamp = f"feat_spark_py_{os.path.getmtime(pkg_dir):.0f}"
    zip_path = os.path.join(tempfile.gettempdir(), stamp)
    if not os.path.exists(zip_path + ".zip"):
        shutil.make_archive(zip_path, "zip", os.path.dirname(pkg_dir), "feat_spark")
    try:
        spark.sparkContext.addPyFile(zip_path + ".zip")
    except Exception:  # already added in this context
        pass


def configure_existing(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable subset of the tuned config to a session
    we did not create (e.g. the driver's verify session)."""
    for k, v in (
        ("spark.sql.session.timeZone", SESSION_TZ),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - read-only conf on some builds
            pass
    return spark
