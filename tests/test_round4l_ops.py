"""Late-round-4 batch V operators: feature-freshness SLO reports,
rank-biased overlap, season-aware outliers, quantile treatment
effects. Hand-computed vectors."""

import datetime

from pyspark.sql import functions as F


def _ts(s):
    return datetime.datetime.fromisoformat(s)


# -------------------------------------------------------- freshness_slo


def test_freshness_slo_staleness_and_rates(spark):
    from feat_spark.plans.features import freshness_slo

    left = spark.createDataFrame(
        [
            ("s", 1, _ts("2024-01-10T00:00:00")),  # 9 days stale
            ("s", 1, _ts("2024-01-03T00:00:00")),  # 2 days stale
            ("s", 2, _ts("2024-01-05T00:00:00")),  # no rhs row at all
        ],
        ["segment", "user_id", "ts"],
    )
    rhs = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"))], ["user_id", "ts"]
    )
    r = freshness_slo(
        left, rhs, on="user_id", segment_col="segment", slo_days=7
    ).collect()[0]
    assert r["n_rows"] == 3 and r["n_matched"] == 2
    assert abs(r["match_rate"] - 2 / 3) < 1e-9
    assert abs(r["avg_staleness_days"] - (9 + 2) / 2) < 1e-9
    assert abs(r["within_slo_rate"] - 0.5) < 1e-9


# --------------------------------------------------------- rbo_rankings


def _ranked(spark, rows):
    return spark.createDataFrame(rows, ["query_id", "item", "rank"])


def test_rbo_identical_rankings_score_one(spark):
    from feat_spark.operators.keywords import rbo_rankings

    a = _ranked(spark, [("q", f"i{r}", r) for r in range(1, 6)])
    r = rbo_rankings(a, a).collect()[0]
    assert r["rbo"] == 1.0 and r["overlap_at_depth"] == 5


def test_rbo_weights_top_heavier(spark):
    from feat_spark.operators.keywords import rbo_rankings

    base = [("q", f"i{r}", r) for r in range(1, 6)]
    # swap ranks 1<->2 vs swap ranks 4<->5: the top swap hurts more
    def swap(rows, x, y):
        m = {x: y, y: x}
        return [(q, i, m.get(r, r)) for q, i, r in rows]

    a = _ranked(spark, base)
    top = rbo_rankings(a, _ranked(spark, swap(base, 1, 2))).collect()[0]
    bot = rbo_rankings(a, _ranked(spark, swap(base, 4, 5))).collect()[0]
    assert top["rbo"] < bot["rbo"] < 1.0
    # hand value for the top swap: X = (0,2,3,4,5) ->
    # (240*2 + 80*3 + 30*4 + 12*5)/1860
    assert abs(top["rbo"] - (240 * 2 + 80 * 3 + 30 * 4 + 12 * 5) / 1860) < 1e-9


def test_rbo_disjoint_is_zero(spark):
    from feat_spark.operators.keywords import rbo_rankings

    a = _ranked(spark, [("q", f"a{r}", r) for r in range(1, 6)])
    b = _ranked(spark, [("q", f"b{r}", r) for r in range(1, 6)])
    assert rbo_rankings(a, b).count() == 0  # no intersecting rows at all


# ----------------------------------------------------- seasonal_outliers


def test_seasonal_outliers_flags_planted_spike(spark):
    from feat_spark.operators.resample import seasonal_outliers

    # weekly pattern + small deterministic jitter (so MAD > 0) + one
    # planted 50.00 spike at day 10
    pattern = [700, 700, 700, 700, 700, 1400, 0]
    rows = []
    for d in range(56):
        v = pattern[d % 7] + (d * 37) % 10
        if d == 10:
            v += 5000
        rows.append((d, v))
    df = spark.createDataFrame(rows, ["day", "cents"])
    out = {r["day"]: r for r in seasonal_outliers(df, "day", "cents").collect()}
    assert 0 not in out and 55 not in out  # edges have no remainder
    flagged = {d for d, r in out.items() if r["is_outlier"]}
    # the spike itself, the days whose trend window it contaminates
    # (7..13), and its day-of-week peers whose seasonal index it
    # shifted — the decomposition-honest blast radius, nothing else
    assert flagged == {3, 7, 8, 9, 10, 11, 12, 13, 17, 24, 31, 38, 45, 52}


def test_seasonal_outliers_constant_series_flags_nothing(spark):
    from feat_spark.operators.resample import seasonal_outliers

    df = spark.createDataFrame([(d, 500) for d in range(21)], ["day", "c"])
    out = seasonal_outliers(df, "day", "c").collect()
    assert out and all(r["is_outlier"] is False for r in out)
    assert all(r["mad"] == 0.0 for r in out)


# ---------------------------------------------------- quantile treatment


def test_qte_rank_selection_and_diff(spark):
    from feat_spark.operators.experiment import quantile_treatment_effect

    rows = [("a", v) for v in range(1, 11)]  # 1..10
    rows += [("b", v) for v in range(11, 21)]  # 11..20
    df = spark.createDataFrame(rows, ["arm", "v"])
    out = {r["p_milli"]: r for r in quantile_treatment_effect(df, "arm", "v").collect()}
    # p50 over 10 rows: target rank ceil(0.5*10)=5 -> 5 and 15
    assert out[500]["q_a"] == 5 and out[500]["q_b"] == 15
    assert out[500]["qte"] == 10
    # p10 -> rank 1; p90 -> rank 9
    assert out[100]["q_a"] == 1 and out[900]["q_a"] == 9
    assert all(r["qte"] == 10 for r in out.values())


def test_qte_null_shift_is_zero(spark):
    from feat_spark.operators.experiment import quantile_treatment_effect

    rows = [(arm, v) for arm in ("a", "b") for v in (3, 7, 7, 9)]
    df = spark.createDataFrame(rows, ["arm", "v"])
    for r in quantile_treatment_effect(df, "arm", "v").collect():
        assert r["qte"] == 0
