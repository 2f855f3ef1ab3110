"""CUPED adjustment and median/MAD outlier flags."""

import pytest

from pyspark.sql import functions as F


def test_cuped_removes_covariate_imbalance(spark):
    from feat_spark.operators.experiment import cuped_adjust

    # y = 3*x exactly, zero true treatment effect — but the variants
    # get imbalanced x by construction, so RAW means differ while the
    # CUPED means must coincide (rho2 = 1 removes everything).
    rows = []
    for i in range(200):
        x = float(10 + (i % 17))
        variant = 0 if i < 100 else 1
        if variant == 1:
            x += 5.0  # covariate imbalance
        rows.append((i, variant, x, 3.0 * x))
    df = spark.createDataFrame(rows, "unit long, variant int, x double, y double")
    out = {r["variant"]: r for r in cuped_adjust(df, "variant", "y", "x").collect()}
    assert out[0]["n_units"] == 100 and out[1]["n_units"] == 100
    # raw means differ by ~3*5 (plus the i%17 phase residue)
    assert out[1]["mean_y"] - out[0]["mean_y"] > 14.0
    assert out[0]["theta"] == pytest.approx(3.0, abs=1e-6)
    assert out[0]["rho2"] == pytest.approx(1.0, abs=1e-6)
    assert out[0]["mean_y_cuped"] == pytest.approx(out[1]["mean_y_cuped"], abs=1e-5)


def test_cuped_degenerate_covariate_falls_back(spark):
    from feat_spark.operators.experiment import cuped_adjust

    rows = [(i, i % 2, 7.0, float(i)) for i in range(20)]
    rows.append((99, 0, None, 5.0))  # null covariate -> dropped
    df = spark.createDataFrame(rows, "unit long, variant int, x double, y double")
    out = {r["variant"]: r for r in cuped_adjust(df, "variant", "y", "x").collect()}
    # constant x: theta = 0, adjusted == raw; the null-x unit dropped
    assert out[0]["theta"] == 0.0 and out[0]["rho2"] == 0.0
    assert out[0]["mean_y_cuped"] == out[0]["mean_y"]
    assert out[0]["n_units"] == 10 and out[1]["n_units"] == 10


def test_robust_outliers_flags_whale_not_tail(spark):
    from feat_spark.operators.profile import robust_outliers

    # group a: values 1..9 plus a 1000.0 whale. median = 5.5,
    # MAD = 2.5 -> threshold 3.5*MAD = 8.75; only the whale exceeds it.
    rows = [(i, "a", float(v)) for i, v in enumerate(range(1, 10))]
    rows.append((9, "a", 1000.0))
    # group b: constant -> MAD 0 -> no z, no flags
    rows += [(100 + i, "b", 4.0) for i in range(5)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = {
        r["event_id"]: r
        for r in robust_outliers(df, "event_type", "value").collect()
    }
    flagged = [i for i, r in out.items() if r["is_outlier"]]
    assert flagged == [9]
    # z of value 1: (200 - 1100) / 500 = -1.8 in half-cent units
    assert out[0]["robust_z"] == pytest.approx(-1.8, abs=1e-9)
    for i in range(100, 105):
        assert out[i]["robust_z"] is None and out[i]["is_outlier"] is False
    # null values are excluded entirely
    df2 = df.withColumn(
        "value", F.when(F.col("event_id") == 3, None).otherwise(F.col("value"))
    )
    assert robust_outliers(df2, "event_type", "value").count() == len(rows) - 1
