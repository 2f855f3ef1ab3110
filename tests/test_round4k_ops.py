"""Late-round-4 batch U operators: rolling HLL distinct windows,
reset-aware cumulative sums, Pareto frontiers, delta-method ratio
CIs, split-conformal calibration. Hand-computed vectors."""

import datetime

from pyspark.sql import functions as F


def _rows(df, *order):
    if order:
        df = df.orderBy(*order)
    return [r.asDict() for r in df.collect()]


def _ts(s):
    return datetime.datetime.fromisoformat(s)


# ------------------------------------------------------ rolling_hll_distinct


def test_rolling_hll_window_semantics(spark):
    from feat_spark.operators.profile import rolling_hll_distinct

    # days 0,1,5: window 3 -> day 1 sees {0,1}, day 5 sees only {5}
    rows = [(0, "a"), (0, "b"), (1, "b"), (1, "c"), (5, "d")]
    df = spark.createDataFrame(rows, ["d", "id"])
    out = {
        r["day"]: r
        for r in rolling_hll_distinct(
            df, F.col("d"), "id", window_days=3
        ).collect()
    }
    assert set(out) == {0, 1, 5}  # spine = observed days only
    assert out[0]["exact_distinct"] == 2  # {a,b}
    assert out[1]["exact_distinct"] == 3 and out[1]["n_leaves"] == 2
    assert out[5]["exact_distinct"] == 1 and out[5]["n_leaves"] == 1
    assert all(r["merged_within_bounds"] for r in out.values())


# ------------------------------------------------------------- reset_cumsum


def test_reset_cumsum_zeroes_then_applies(spark):
    from feat_spark.operators.rolling import reset_cumsum

    rows = [
        ("u", 1, 1, 10, False),
        ("u", 2, 2, 5, False),
        ("u", 3, 3, 7, True),   # reset: balance restarts AT its delta
        ("u", 4, 4, 2, False),
    ]
    df = spark.createDataFrame(rows, ["k", "t", "i", "d", "r"])
    out = {r["i"]: r for r in reset_cumsum(df, "k", "t", "i", "d", "r").collect()}
    assert [out[i]["balance"] for i in (1, 2, 3, 4)] == [10, 15, 7, 9]
    assert [out[i]["segment"] for i in (1, 2, 3, 4)] == [0, 0, 1, 1]


def test_reset_cumsum_partition_invariant(spark):
    from feat_spark.operators.rolling import reset_cumsum

    rows = [("u", i, i, i % 5, i % 7 == 0) for i in range(40)]
    df = spark.createDataFrame(rows, ["k", "t", "i", "d", "r"])
    a = _rows(reset_cumsum(df, "k", "t", "i", "d", "r"), "i")
    b = _rows(reset_cumsum(df.repartition(13), "k", "t", "i", "d", "r"), "i")
    assert a == b


# ---------------------------------------------------------- pareto_frontier


def test_pareto_frontier_dominance(spark):
    from feat_spark.operators.profile import pareto_frontier

    # (3,1) (2,5) (1,9) frontier; (2,4) dominated by (2,5); (1,1) by all
    rows = [
        ("g", 1, 3, 1.0), ("g", 2, 2, 5.0), ("g", 3, 1, 9.0),
        ("g", 4, 2, 4.0), ("g", 5, 1, 1.0),
    ]
    df = spark.createDataFrame(rows, ["g", "id", "x", "y"])
    out = {r["id"] for r in pareto_frontier(df, ("g",), "x", "y", "id").collect()}
    assert out == {1, 2, 3}


def test_pareto_frontier_duplicate_points_keep_first(spark):
    from feat_spark.operators.profile import pareto_frontier

    rows = [("g", 1, 5, 5.0), ("g", 2, 5, 5.0)]
    df = spark.createDataFrame(rows, ["g", "id", "x", "y"])
    out = [r["id"] for r in pareto_frontier(df, ("g",), "x", "y", "id").collect()]
    assert out == [1]


# ---------------------------------------------------------- ratio_metric_ci


def test_ratio_ci_matches_closed_form(spark):
    from feat_spark.operators.experiment import ratio_metric_ci

    # 3 clusters: (x, n) = (1, 4), (2, 4), (3, 8)
    rows = []
    for cid, x, n in ((1, 1, 4), (2, 2, 4), (3, 3, 8)):
        rows += [(cid, 1, 1)] * x + [(cid, 0, 1)] * (n - x)
    df = spark.createDataFrame(rows, ["c", "x", "n"])
    r = ratio_metric_ci(df, "c", "x", "n").collect()[0]
    assert r["k_clusters"] == 3
    assert abs(r["ratio"] - 6 / 16) < 1e-12
    k, sx, sn = 3, 6, 16
    sxx, snn, sxn = 14, 96, 36
    vxx = (k * sxx - sx * sx) / (k * (k - 1))
    vnn = (k * snn - sn * sn) / (k * (k - 1))
    vxn = (k * sxn - sx * sn) / (k * (k - 1))
    R = sx / sn
    nbar = sn / k
    var = (vxx + R * R * vnn - 2 * R * vxn) / (k * nbar * nbar)
    se = var ** 0.5
    assert abs(r["se"] - se) < 1e-9
    assert abs(r["ci_low"] - (R - 1.96 * se)) < 1e-8
    assert abs(r["ci_high"] - (R + 1.96 * se)) < 1e-8


def test_ratio_ci_zero_variance_clusters(spark):
    from feat_spark.operators.experiment import ratio_metric_ci

    # identical clusters -> zero variance -> degenerate zero-width CI
    rows = [(c, 1, 1) for c in (1, 2)] + [(c, 0, 1) for c in (1, 2)]
    df = spark.createDataFrame(rows, ["c", "x", "n"])
    r = ratio_metric_ci(df, "c", "x", "n").collect()[0]
    assert r["se"] == 0.0 and r["ci_low"] == r["ci_high"] == r["ratio"] == 0.5


# ---------------------------------------------------- conformal calibration


def test_conformal_coverage_on_uniform_values(spark):
    from feat_spark.operators.experiment import conformal_calibration

    rows = [("g", 100 + (i * 37) % 500, f"id{i}") for i in range(400)]
    df = spark.createDataFrame(rows, ["g", "v", "id"])
    r = conformal_calibration(df, "g", "v", "id", alpha_milli=100).collect()[0]
    assert r["n_cal"] + r["n_test"] == 400
    assert r["qhat"] > 0
    # split-conformal guarantee is >= 1 - alpha in expectation; allow
    # slack for the finite split but it must sit near the target
    assert r["coverage"] >= 0.8
    assert r["target_coverage"] == 0.9


def test_conformal_qhat_is_rank_selected(spark):
    from feat_spark.operators.experiment import conformal_calibration
    from feat_spark.functions.text import md5_long32

    rows = [("g", v, f"id{v}") for v in range(1, 41)]
    df = spark.createDataFrame(rows, ["g", "v", "id"])
    r = conformal_calibration(df, "g", "v", "id", alpha_milli=100).collect()[0]
    # recompute by hand: calibration half + its residual rank
    half = {
        row["id"]: row["h"]
        for row in df.select(
            "id", F.pmod(md5_long32(F.col("id")), F.lit(2)).alias("h")
        ).collect()
    }
    cal = [v for v in range(1, 41) if half[f"id{v}"] == 0]
    mean = sum(cal) / len(cal)
    res = sorted(abs(v - mean) for v in cal)
    import math

    k = min(math.ceil((len(cal) + 1) * 0.9), len(cal))
    assert abs(r["qhat"] - res[k - 1]) < 1e-9
    assert r["n_cal"] == len(cal)
