"""Late-round-4 batch X surfaces: the Spark-4 custom Python
DataSource API and VariantType semi-structured extraction."""

import hashlib

from pyspark.sql import functions as F


# --------------------------------------------------- python data source


def test_python_datasource_rows_and_partitions(spark):
    from feat_spark.sources.pysource import _bucket, register

    register(spark)
    df = (
        spark.read.format("feat_synth")
        .option("n", "100")
        .option("partitions", "7")
        .option("width", "50")
        .load()
    )
    rows = {r["id"]: r["bucket"] for r in df.collect()}
    assert set(rows) == set(range(100))  # every id exactly once
    for i in (0, 1, 42, 99):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        assert rows[i] == h % 50 == _bucket(i, 50)
    # partition count survives into the scan
    assert df.rdd.getNumPartitions() == 7


def test_python_datasource_composes_with_engine_ops(spark):
    from feat_spark.sources.pysource import register

    register(spark)
    df = (
        spark.read.format("feat_synth")
        .option("n", "64")
        .option("partitions", "3")
        .load()
    )
    agg = df.agg(
        F.count(F.lit(1)).alias("n"), F.sum("id").alias("s")
    ).collect()[0]
    assert agg["n"] == 64 and agg["s"] == 64 * 63 // 2


# ------------------------------------------------------ variant extract


def test_variant_features_typed_and_null_paths(spark):
    from feat_spark.operators.semistructured import variant_features

    df = spark.createDataFrame(
        [
            ('{"k": 7, "s": "hi", "nest": {"x": 1.5}}',),
            ('{"k": "notanint"}',),
            ("{broken",),
        ],
        ["j"],
    )
    f = variant_features(
        "j",
        {
            "k": ("$.k", "int"),
            "s": ("$.s", "string"),
            "x": ("$.nest.x", "double"),
        },
    )
    out = df.select(
        f["k"].alias("k"), f["s"].alias("s"), f["x"].alias("x"),
        f["is_valid_json"].alias("ok"),
    ).collect()
    assert out[0].asDict() == {"k": 7, "s": "hi", "x": 1.5, "ok": True}
    # wrong-typed field -> NULL (try_variant_get), row still valid
    assert out[1]["k"] is None and out[1]["ok"] is True
    # malformed row -> everything NULL, flagged invalid
    assert out[2]["ok"] is False and out[2]["k"] is None
