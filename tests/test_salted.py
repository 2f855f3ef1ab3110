"""Salted two-phase aggregation: bit-equality with the plain group-by
on Zipf-skewed transcripts (the designated hot conversation included),
plus the derived-avg path and the non-mergeable rejection."""

import pytest
from pyspark.sql import functions as F

from feat_spark.operators.salted import salted_group_agg
from feat_spark.sources.synth import synth_transcripts


@pytest.fixture(scope="module")
def skewed(spark):
    df = synth_transcripts(spark, n_convs=25, mean_turns=20, seed=11)
    return df.withColumn("n_chars", F.length("text").cast("decimal(18,2)"))


def _by_key(df):
    return {r["conv_id"]: r.asDict() for r in df.collect()}


def test_salted_equals_plain(spark, skewed):
    got = _by_key(
        salted_group_agg(
            skewed, "conv_id", {"n_chars": ["sum", "count", "min", "max"]}, n_salts=8
        )
    )
    want = _by_key(
        skewed.groupBy("conv_id").agg(
            F.sum("n_chars").alias("n_chars_sum"),
            F.count("n_chars").alias("n_chars_count"),
            F.min("n_chars").alias("n_chars_min"),
            F.max("n_chars").alias("n_chars_max"),
        )
    )
    assert got.keys() == want.keys()
    for k in want:
        for c in ("n_chars_sum", "n_chars_count", "n_chars_min", "n_chars_max"):
            assert got[k][c] == want[k][c], (k, c)


def test_salted_avg_derivation(spark, skewed):
    got = _by_key(salted_group_agg(skewed, "conv_id", {"n_chars": ["avg"]}, n_salts=4))
    want = _by_key(
        skewed.groupBy("conv_id").agg(F.avg("n_chars").alias("avg"))
    )
    for k in want:
        assert abs(float(got[k]["n_chars_avg"]) - float(want[k]["avg"])) < 1e-9
    assert "n_chars_sum" not in next(iter(got.values()))


def test_salted_rejects_non_mergeable(spark, skewed):
    with pytest.raises(ValueError, match="not salt-mergeable"):
        salted_group_agg(skewed, "conv_id", {"n_chars": ["stddev"]})


def test_salted_default_salt_skips_map_columns(spark):
    """ADVICE r2: xxhash64 rejects MAP (DATATYPE_MISMATCH.HASH_MAP_TYPE),
    so a frame containing a map column must still salt (using the
    remaining hashable columns), not raise."""
    df = spark.createDataFrame(
        [(1, 10, {"a": 1}), (1, 20, {"b": 2}), (2, 30, {"c": 3})],
        "conv_id long, n_chars long, attrs map<string,long>",
    )
    got = _by_key(salted_group_agg(df, "conv_id", {"n_chars": ["sum", "count"]}))
    assert got[1]["n_chars_sum"] == 30 and got[1]["n_chars_count"] == 2
    assert got[2]["n_chars_sum"] == 30 and got[2]["n_chars_count"] == 1


def test_salted_map_in_array_and_struct_also_excluded(spark):
    """The type filter is recursive: array<map> and struct<…,map,…>
    are just as unhashable as a bare map."""
    df = spark.createDataFrame(
        [(1, 10, [{"a": 1}], (1, {"x": 1})), (1, 20, [], (2, {"y": 2}))],
        "conv_id long, v long, arr array<map<string,long>>, "
        "st struct<i: long, m: map<string,long>>",
    )
    got = _by_key(salted_group_agg(df, "conv_id", {"v": ["sum"]}))
    assert got[1]["v_sum"] == 30
