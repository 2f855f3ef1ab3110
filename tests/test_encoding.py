"""Feature-encoding operators: equal-frequency binning and leakage-safe
target encoding (driver gates `quantile_bin` / `target_encode` are the
oracle-checked twins)."""

import pytest
from pyspark.sql import functions as F

from feat_spark.operators.encoding import cumulative_target_encode, quantile_bin


def test_quantile_bin_equal_frequency(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "id long, v double"
    )
    out = quantile_bin(df, "v", n_bins=4).toPandas()
    counts = out.groupby("v_bin").size()
    assert sorted(counts.index) == [0, 1, 2, 3]
    # equal-frequency on a uniform ramp: 25 per bin (boundary rows
    # included on the lower side of the half-open rule)
    assert counts.min() >= 24 and counts.max() <= 26
    # monotone: higher value -> same or higher bin
    s = out.sort_values("v")
    assert s["v_bin"].is_monotonic_increasing


def test_quantile_bin_null_and_constant(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, None), (4, 5.0)], "id long, v double"
    )
    out = {r["id"]: r["v_bin"] for r in quantile_bin(df, "v", n_bins=4).collect()}
    assert out[3] is None
    # constant column: every boundary equals the value, nothing is
    # strictly above -> everyone lands in bin 0
    assert out[1] == out[2] == out[4] == 0


def test_target_encode_preceding_only(spark):
    rows = [
        # (id, ts-order, cat, target)
        (1, 1, "a", 10.0),
        (2, 2, "a", 20.0),
        (3, 3, "a", 30.0),
        (4, 1, "b", 100.0),
        (5, 2, "b", None),
        (6, 3, "b", 200.0),
    ]
    df = spark.createDataFrame(rows, "id long, t long, cat string, y double")
    out = {
        r["id"]: r["cat_te"]
        for r in cumulative_target_encode(
            df, "cat", "y", order=("t",), tiebreak=("id",)
        ).collect()
    }
    assert out[1] is None          # no history
    assert out[2] == 10.0          # mean of {10}
    assert out[3] == 15.0          # mean of {10, 20} — never sees 30
    assert out[4] is None
    assert out[5] == 100.0
    assert out[6] == 100.0         # NULL target rows add no information


def test_target_encode_small_magnitude_targets(spark):
    """Review finding r3: CTR-scale targets (0.003, 0.007) must not be
    quantized away by the decimal sum."""
    rows = [(1, 1, "a", 0.003), (2, 2, "a", 0.007), (3, 3, "a", 0.005)]
    df = spark.createDataFrame(rows, "id long, t long, cat string, y double")
    out = {
        r["id"]: r["cat_te"]
        for r in cumulative_target_encode(
            df, "cat", "y", order=("t",), tiebreak=("id",)
        ).collect()
    }
    assert out[2] == 0.003
    assert out[3] == 0.005  # mean of {0.003, 0.007}


def test_winsorize_clips_to_group_bounds(spark):
    from feat_spark.operators.encoding import winsorize

    rows = [("a", float(v)) for v in range(1, 101)] + [
        ("b", 0.0), ("b", 1000.0), ("b", 10.0), ("b", 20.0), ("b", 30.0),
        ("a", None),
    ]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = winsorize(df, "v", group_col="grp", lo=0.05, hi=0.95).toPandas()

    import numpy as np

    a_vals = np.arange(1, 101, dtype=float)
    lo, hi = np.quantile(a_vals, 0.05), np.quantile(a_vals, 0.95)
    a = out[(out["grp"] == "a") & out["v"].notna()]
    assert (a["v_wins"] >= round(lo, 6) - 1e-9).all()
    assert (a["v_wins"] <= round(hi, 6) + 1e-9).all()
    # interior values untouched
    mid = a[(a["v"] > lo) & (a["v"] < hi)]
    assert (mid["v_wins"] == mid["v"]).all()
    # group b's outlier clipped to ITS OWN bounds, not group a's
    b_out = out[(out["grp"] == "b") & (out["v"] == 1000.0)]["v_wins"].iloc[0]
    assert b_out < 1000.0 and b_out > hi
    # NULL stays NULL (greatest/least null-skip guarded)
    assert out[out["v"].isna()]["v_wins"].isna().all()


def test_calendar_features_known_dates(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from feat_spark.operators.encoding import calendar_features

    # 1970-01-01 = Thursday (dow 3 with 0=Monday); 2024-06-08 = Saturday
    rows = [
        (1, dt.datetime(1970, 1, 1, 0, 0)),
        (2, dt.datetime(2024, 6, 8, 13, 30)),
        (3, dt.datetime(2024, 6, 10, 23, 59)),  # Monday
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    out = calendar_features(df).toPandas().set_index("id")
    assert out.loc[1, "dow"] == 3 and not out.loc[1, "is_weekend"]
    assert out.loc[2, "dow"] == 5 and out.loc[2, "is_weekend"]
    assert out.loc[2, "hour"] == 13
    assert out.loc[3, "dow"] == 0 and out.loc[3, "hour"] == 23
    # cyclical: hour 0 -> sin 0, cos 1
    assert out.loc[1, "hour_sin"] == 0.0 and out.loc[1, "hour_cos"] == 1.0


def test_impute_group_mean(spark):
    import math

    from feat_spark.operators.encoding import impute_group_mean

    rows = [("a", 10.0), ("a", None), ("a", 20.0),
            ("b", None), ("b", 7.0), ("c", None)]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = impute_group_mean(df, col="v", group_col="grp").toPandas()
    a_null = out[(out["grp"] == "a") & out["v"].isna()]
    assert (a_null["v_imputed"] == 15.0).all() and a_null["v_was_null"].all()
    # non-null rows untouched, flag false
    a_ok = out[(out["grp"] == "a") & out["v"].notna()]
    assert (a_ok["v_imputed"] == a_ok["v"]).all()
    assert not a_ok["v_was_null"].any()
    assert (out[out["grp"] == "b"]["v_imputed"].dropna() == 7.0).all()
    # an all-null group stays NULL (no global fallback)
    c = out[out["grp"] == "c"].iloc[0]
    assert math.isnan(c["v_imputed"]) or c["v_imputed"] is None


def test_group_linear_fit_matches_numpy(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from feat_spark.operators.encoding import group_linear_fit

    rng = np.random.default_rng(7)
    rows = []
    # user 1: clean upward trend; user 2: noisy flat; user 3: constant x
    for i in range(30):
        rows.append((1, 1000.0 + i * 60.0, 5.0 + 0.02 * (i * 60.0) +
                     float(rng.normal(0, 0.1))))
    for i in range(20):
        rows.append((2, 2000.0 + i * 60.0, 7.0 + float(rng.normal(0, 1.0))))
    rows.append((3, 500.0, 1.0))
    rows.append((3, 500.0, 9.0))
    df = spark.createDataFrame(rows, "user_id long, x double, y double")
    out = (
        group_linear_fit(df, x_col=F.col("x"), y_col="y", group_col="user_id")
        .toPandas().set_index("user_id")
    )
    for uid in (1, 2):
        xs = np.array([r[1] for r in rows if r[0] == uid])
        ys = np.array([r[2] for r in rows if r[0] == uid])
        slope, intercept = np.polyfit(xs - xs.min(), ys, 1)
        r = np.corrcoef(xs, ys)[0, 1]
        assert abs(out.loc[uid, "slope"] - slope) < 1e-6
        assert abs(out.loc[uid, "intercept"] - intercept) < 1e-4
        assert abs(out.loc[uid, "r2"] - r * r) < 1e-4
    assert abs(out.loc[1, "slope"] - 0.02) < 2e-3  # recovered the trend
    assert out.loc[1, "r2"] > 0.99
    # constant x: no fit
    import pandas as pd

    assert pd.isna(out.loc[3, "slope"]) and pd.isna(out.loc[3, "r2"])
    assert out.loc[3, "n_obs"] == 2
