"""Late-round-4 batch AA operators: restricted mean survival time,
radius-2 harmonic centrality, intraday pacing curves, Simpson's
paradox detection. Hand-computed vectors."""

import datetime

from pyspark.sql import functions as F


def _ts(s):
    return datetime.datetime.fromisoformat(s)


# --------------------------------------------------------- km_expected_life


def test_rmst_hand_curve(spark):
    from feat_spark.operators.labels import km_expected_life

    # survival steps: S=1 on [0,2), 0.5 on [2,5), 0.25 on [5,10)
    km = spark.createDataFrame(
        [(2, 0.5), (5, 0.25)], ["t", "survival"]
    )
    r = km_expected_life(km, horizon=10).collect()[0]
    # 2*1 + 3*0.5 + 5*0.25 = 4.75
    assert abs(r["expected_life"] - 4.75) < 1e-9
    assert r["horizon"] == 10


def test_rmst_truncates_at_horizon(spark):
    from feat_spark.operators.labels import km_expected_life

    km = spark.createDataFrame([(2, 0.5), (50, 0.1)], ["t", "survival"])
    r = km_expected_life(km, horizon=10).collect()[0]
    # 2*1 + (10-2)*0.5; the t=50 piece lies beyond the horizon
    assert abs(r["expected_life"] - (2 + 8 * 0.5)) < 1e-9


# ----------------------------------------------------------- harmonic_2hop


def test_harmonic_2hop_path_graph(spark):
    from feat_spark.operators.graph import harmonic_2hop

    # path 1-2-3-4: node 2 has n1=2 (1,3), n2=1 (4) -> H = 2.5
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["src", "dst"])
    out = {r["node"]: r for r in harmonic_2hop(df).collect()}
    assert out[2]["n1"] == 2 and out[2]["n2"] == 1
    assert out[2]["harmonic"] == 2.5
    assert out[1]["n1"] == 1 and out[1]["n2"] == 1  # reaches 3 at d=2
    assert out[1]["harmonic"] == 1.5


def test_harmonic_2hop_triangle_has_no_distance_two(spark):
    from feat_spark.operators.graph import harmonic_2hop

    df = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], ["src", "dst"])
    for r in harmonic_2hop(df).collect():
        assert r["n1"] == 2 and r["n2"] == 0 and r["harmonic"] == 2.0


# ------------------------------------------------------------ pacing_curve


def test_pacing_curve_shares_and_cdf(spark):
    from feat_spark.operators.profile import pacing_curve

    rows = [
        (_ts("2024-01-01T01:00:00"), 1.0),
        (_ts("2024-01-02T01:30:00"), 1.0),  # pooled across days
        (_ts("2024-01-01T13:00:00"), 2.0),
    ]
    df = spark.createDataFrame(rows, ["ts", "value"])
    out = {r["hour"]: r for r in pacing_curve(df).collect()}
    assert out[1]["cents"] == 200 and abs(out[1]["share"] - 0.5) < 1e-12
    assert abs(out[1]["cum_share"] - 0.5) < 1e-12
    assert abs(out[13]["cum_share"] - 1.0) < 1e-12


# ---------------------------------------------------------- simpsons_check


def test_simpsons_classic_flip_flags(spark):
    from feat_spark.operators.experiment import simpsons_check

    # classic kidney-stone shape: A beats B inside BOTH strata, but B
    # wins pooled because A is loaded with the hard stratum
    rows = []
    def arm(s, a, x, n):
        return [(s, a, 1)] * x + [(s, a, 0)] * (n - x)

    rows += arm("easy", "a", 81, 87) + arm("easy", "b", 234, 270)
    rows += arm("hard", "a", 192, 263) + arm("hard", "b", 55, 80)
    df = spark.createDataFrame(rows, ["s", "arm", "y"])
    r = simpsons_check(df, "s", "arm", "y").collect()[0]
    assert r["n_strata"] == 2
    assert r["pooled_sign"] == -1  # pooled says B wins
    assert r["n_oppose"] == 2 and r["n_agree"] == 0
    assert r["simpsons_flag"] is True


def test_simpsons_consistent_data_does_not_flag(spark):
    from feat_spark.operators.experiment import simpsons_check

    rows = []
    for s in ("x", "y"):
        rows += [(s, "a", 1)] * 6 + [(s, "a", 0)] * 4
        rows += [(s, "b", 1)] * 4 + [(s, "b", 0)] * 6
    df = spark.createDataFrame(rows, ["s", "arm", "y"])
    r = simpsons_check(df, "s", "arm", "y").collect()[0]
    assert r["pooled_sign"] == 1 and r["n_agree"] == 2
    assert r["simpsons_flag"] is False


# ------------------------------------------------- quantile_forecast_eval


def test_quantile_forecast_rank_selection_and_pinball(spark):
    from feat_spark.operators.resample import quantile_forecast_eval

    # days 0..6 values 10..70; day 7 actual 40 scored against the full
    # trailing window {10..70}: p50 rank ceil(0.5*7)=4 -> f=40 -> loss 0
    rows = [(d, (d + 1) * 10) for d in range(7)] + [(7, 40)]
    df = spark.createDataFrame(rows, ["day", "cents"])
    out = {
        (r["tau_milli"]): r
        for r in quantile_forecast_eval(
            df, "day", "cents", taus_milli=(500,), window_days=7
        ).collect()
    }
    r = out[500]
    assert r["n_scored"] == 7  # days 1..7 have non-empty history
    # day 7's forecast is exactly 40 -> contributes zero loss; the
    # early days under-forecast (history below actual)
    assert r["mean_pinball_cents"] > 0


def test_quantile_forecast_p90_covers_more_than_p10(spark):
    from feat_spark.operators.resample import quantile_forecast_eval

    rows = [(d, 100 + (d * 37) % 50) for d in range(40)]
    df = spark.createDataFrame(rows, ["day", "cents"])
    out = {r["tau_milli"]: r for r in quantile_forecast_eval(df, "day", "cents").collect()}
    assert out[900]["coverage"] > out[500]["coverage"] > out[100]["coverage"]
    # a p90 trailing forecast on a stationary series covers well over half
    assert out[900]["coverage"] > 0.6
