"""Late-round-4 batch Q operators: Count-Min sketch heavy hitters,
decile gains/lift tables, exact Brier scores, precision/recall
threshold sweeps, two-regressor closed-form OLS, neighborhood-Jaccard
link prediction, input-side target-leakage screening, dominant entry
paths. Hand-computed vectors throughout."""

import datetime

from pyspark.sql import functions as F


def _rows(df, *order):
    if order:
        df = df.orderBy(*order)
    return [r.asDict() for r in df.collect()]


def _ts(s):
    return datetime.datetime.fromisoformat(s)


# ------------------------------------------------------------ countmin_topk


def test_countmin_estimates_never_undercount(spark):
    from feat_spark.operators.cms import countmin_topk

    rows = [("a",)] * 50 + [("b",)] * 30 + [(f"x{i}",) for i in range(40)]
    df = spark.createDataFrame(rows, ["k"])
    # w=4 forces collisions: estimates may exceed, never undercount
    out = {r["key"]: r for r in countmin_topk(df, "k", k=5, depth=3, width=4).collect()}
    assert out["a"]["exact_n"] == 50 and out["b"]["exact_n"] == 30
    for r in out.values():
        assert r["cms_est"] >= r["exact_n"]


def test_countmin_exact_when_collision_free(spark):
    from feat_spark.operators.cms import countmin_topk

    df = spark.createDataFrame([("a",)] * 7 + [("b",)] * 3, ["k"])
    # 2 keys in a 4096-wide grid: collision probability ~0 per seed row,
    # and min over 4 seeds needs only ONE collision-free row
    out = {r["key"]: r for r in countmin_topk(df, "k", k=2, depth=4, width=4096).collect()}
    assert out["a"]["cms_est"] == 7 and out["b"]["cms_est"] == 3


def test_countmin_grid_is_bounded_and_mergeable(spark):
    from feat_spark.operators.cms import countmin_build

    df = spark.createDataFrame([(f"k{i % 17}",) for i in range(200)], ["k"])
    grid = countmin_build(df, "k", depth=3, width=8)
    assert grid.count() <= 3 * 8
    # every seed row carries the full stream mass (sum invariant)
    per_seed = {r["seed"]: r["t"] for r in grid.groupBy("seed").agg(F.sum("n").alias("t")).collect()}
    assert set(per_seed.values()) == {200}


# ------------------------------------------------------------- gains_table


def test_gains_table_capture_and_lift(spark):
    from feat_spark.operators.experiment import gains_table

    # 10 rows, scores 10..1; positives exactly at the top 3 scores
    rows = [("s", i, 10 - i, 1 if i < 3 else 0) for i in range(10)]
    df = spark.createDataFrame(rows, ["seg", "id", "score", "y"])
    out = {r["bin"]: r for r in gains_table(df, "seg", "score", "y", tiebreak_col="id", n_bins=5).collect()}
    # bin 1 = top-2 scores -> 2 of 3 positives captured
    assert out[1]["n"] == 2 and out[1]["n_pos"] == 2
    assert abs(out[1]["capture"] - 2 / 3) < 1e-9
    # lift(bin1) = (2/2) / (3/10) = 10/3
    assert abs(out[1]["lift"] - 10 / 3) < 1e-9
    # bin 2 holds the remaining positive; cumulative capture hits 1.0
    assert out[2]["cum_pos"] == 3 and abs(out[2]["capture"] - 1.0) < 1e-12
    # tail bins are empty of positives -> lift 0
    assert out[5]["n_pos"] == 0 and out[5]["lift"] == 0.0


def test_gains_table_deterministic_under_score_ties(spark):
    from feat_spark.operators.experiment import gains_table

    rows = [("s", i, 5, i % 2) for i in range(8)]  # all scores tie
    df = spark.createDataFrame(rows, ["seg", "id", "score", "y"])
    a = _rows(gains_table(df, "seg", "score", "y", tiebreak_col="id", n_bins=4), "bin")
    b = _rows(gains_table(df.repartition(7), "seg", "score", "y", tiebreak_col="id", n_bins=4), "bin")
    assert a == b


# ------------------------------------------------------------- brier_score


def test_brier_perfect_and_base_predictors(spark):
    from feat_spark.operators.experiment import brier_score

    # group p: perfect confident predictor -> brier 0, skill 1
    # group b: constant 500 score on a 50% base -> brier = base -> skill 0
    rows = [("p", 1000, 1), ("p", 0, 0), ("p", 1000, 1), ("p", 0, 0)]
    rows += [("b", 500, 1), ("b", 500, 0)]
    df = spark.createDataFrame(rows, ["g", "s", "y"])
    out = {r["g"]: r for r in brier_score(df, "g", "s", "y").collect()}
    assert out["p"]["brier"] == 0.0 and out["p"]["brier_skill"] == 1.0
    assert abs(out["b"]["brier"] - 0.25) < 1e-12
    assert abs(out["b"]["brier_skill"]) < 1e-9
    assert out["b"]["base_rate"] == 0.5


def test_brier_skill_null_for_degenerate_group(spark):
    from feat_spark.operators.experiment import brier_score

    df = spark.createDataFrame([("g", 900, 1), ("g", 800, 1)], ["g", "s", "y"])
    r = brier_score(df, "g", "s", "y").collect()[0]
    assert r["brier_skill"] is None  # all-positive: no base to beat
    assert abs(r["brier"] - ((100 * 100 + 200 * 200) / 2 / 1e6)) < 1e-12


# ----------------------------------------------------------- pr_thresholds


def test_pr_thresholds_hand_counts(spark):
    from feat_spark.operators.experiment import pr_thresholds

    # scores/labels: (900,1) (700,0) (400,1) (100,0)
    df = spark.createDataFrame(
        [(900, 1), (700, 0), (400, 1), (100, 0)], ["s", "y"]
    )
    out = {r["threshold_milli"]: r for r in pr_thresholds(df, "s", "y", thresholds_milli=(300, 800)).collect()}
    # t=300: predicted {900,700,400} -> tp=2 fp=1 fn=0
    assert (out[300]["tp"], out[300]["fp"], out[300]["fn"]) == (2, 1, 0)
    assert abs(out[300]["precision"] - 2 / 3) < 1e-9
    assert out[300]["recall"] == 1.0
    assert abs(out[300]["f1"] - 0.8) < 1e-9
    # t=800: predicted {900} -> tp=1 fp=0 fn=1
    assert (out[800]["tp"], out[800]["fp"], out[800]["fn"]) == (1, 0, 1)
    assert out[800]["precision"] == 1.0 and out[800]["recall"] == 0.5


def test_pr_thresholds_null_ratios_when_empty(spark):
    from feat_spark.operators.experiment import pr_thresholds

    df = spark.createDataFrame([(100, 0), (200, 0)], ["s", "y"])
    r = pr_thresholds(df, "s", "y", thresholds_milli=(900,)).collect()[0]
    assert r["precision"] is None  # no predicted positives
    assert r["recall"] is None  # no actual positives
    assert r["f1"] is None


# ---------------------------------------------------------------- ols2_fit


def test_ols2_recovers_exact_plane(spark):
    from feat_spark.operators.encoding import ols2_fit

    # y = 2 + 3*x1 - x2 on a non-collinear design
    pts = [(0, 0), (1, 0), (0, 1), (1, 1), (2, 1), (2, 3)]
    rows = [("g", x1, x2, 2 + 3 * x1 - x2) for x1, x2 in pts]
    df = spark.createDataFrame(rows, ["g", "x1", "x2", "y"])
    r = ols2_fit(df, "g", "x1", "x2", "y").collect()[0]
    assert abs(r["b1"] - 3.0) < 1e-9
    assert abs(r["b2"] + 1.0) < 1e-9
    assert abs(r["b0"] - 2.0) < 1e-9


def test_ols2_collinear_and_small_groups_null(spark):
    from feat_spark.operators.encoding import ols2_fit

    rows = [("c", i, 2 * i, i) for i in range(5)]  # x2 = 2*x1: det = 0
    rows += [("s", 0, 1, 5), ("s", 1, 0, 7)]  # n=2 < 3
    df = spark.createDataFrame(rows, ["g", "x1", "x2", "y"])
    out = {r["g"]: r for r in ols2_fit(df, "g", "x1", "x2", "y").collect()}
    for g in ("c", "s"):
        assert out[g]["b1"] is None and out[g]["b2"] is None and out[g]["b0"] is None


# ------------------------------------------------------------ link_jaccard


def test_link_jaccard_square_graph(spark):
    from feat_spark.operators.graph import link_jaccard

    # square a-b-c-d-a: diagonals (a,c) and (b,d) are the candidates,
    # each sharing BOTH neighbors: J = 2 / (2+2-2) = 1.0
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], ["src", "dst"]
    )
    out = _rows(link_jaccard(df, k=5), "node", "suggestion")
    pairs = {(r["node"], r["suggestion"]): r for r in out}
    assert pairs[(1, 3)]["common_neighbors"] == 2
    assert pairs[(1, 3)]["jaccard"] == 1.0
    assert pairs[(2, 4)]["jaccard"] == 1.0
    # direct edges never appear as suggestions
    assert (1, 2) not in pairs and (2, 1) not in pairs


def test_link_jaccard_topk_rank_order(spark):
    from feat_spark.operators.graph import link_jaccard

    # star center 0 with leaves 1..4 -> all leaf pairs share exactly {0},
    # J = 1/(1+1-1) = 1; k=2 keeps the two smallest suggestions per node
    df = spark.createDataFrame([(0, i) for i in range(1, 5)], ["src", "dst"])
    out = [r for r in link_jaccard(df, k=2).collect() if r["node"] == 3]
    assert [r["suggestion"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2]


# ---------------------------------------------------------- leakage_screen


def test_leakage_screen_flags_the_plant(spark):
    from feat_spark.operators.profile import leakage_screen

    rows = [(i, i % 2, (i * 7) % 5, i % 2) for i in range(40)]
    df = spark.createDataFrame(rows, ["id", "leak", "honest", "y"])
    out = {r["feature"]: r for r in leakage_screen(df, ["leak", "honest"], "y").collect()}
    assert out["leak"]["corr"] == 1.0 and out["leak"]["leakage_suspect"] is True
    assert abs(out["honest"]["abs_corr"]) < 0.95
    assert out["honest"]["leakage_suspect"] is False


def test_leakage_screen_zero_variance_is_null(spark):
    from feat_spark.operators.profile import leakage_screen

    df = spark.createDataFrame([(5, 0), (5, 1), (5, 0)], ["c", "y"])
    r = leakage_screen(df, ["c"], "y").collect()[0]
    assert r["corr"] is None and r["leakage_suspect"] is None


# --------------------------------------------------------------- top_paths


def test_top_paths_truncates_and_counts(spark):
    from feat_spark.operators.funnel import top_paths

    rows = []
    for u in (1, 2):  # two users with the identical v>c>p entry
        for i, t in enumerate(["v", "c", "p"]):
            rows.append((u, t, _ts(f"2024-01-01T00:0{i}:00"), u * 10 + i))
    # user 3: six events, truncated at 5
    for i in range(6):
        rows.append((3, f"e{i}", _ts(f"2024-01-01T00:0{i}:00"), 30 + i))
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts", "event_id"])
    out = _rows(top_paths(df, "user_id", "event_type", max_steps=5, topn=10))
    assert out[0] == {"path": "v>c>p", "n_entities": 2, "depth": 3}
    assert {"path": "e0>e1>e2>e3>e4", "n_entities": 1, "depth": 5} in out
    assert all("e5" not in r["path"] for r in out)


def test_top_paths_orders_by_ts_then_tiebreak(spark):
    from feat_spark.operators.funnel import top_paths

    t0 = _ts("2024-01-01T00:00:00")
    df = spark.createDataFrame(
        [(1, "b", t0, 2), (1, "a", t0, 1)], ["user_id", "event_type", "ts", "event_id"]
    )
    out = _rows(top_paths(df, "user_id", "event_type"))
    assert out[0]["path"] == "a>b"  # event_id breaks the ts tie
