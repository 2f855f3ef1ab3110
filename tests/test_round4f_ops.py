"""Late-round-4 batch P operators: Theil-Sen robust trends,
Nelson-Aalen cumulative hazard, item-item cosine similarity, mergeable
HLL rollups, point-in-time recency features, local clustering
coefficients. Hand-computed vectors throughout."""

import datetime
import math

from pyspark.sql import functions as F


def _rows(df, *order):
    if order:
        df = df.orderBy(*order)
    return [r.asDict() for r in df.collect()]


def _ts(s):
    return datetime.datetime.fromisoformat(s)


# ---------------------------------------------------------------- theilsen_fit


def test_theilsen_matches_hand_median(spark):
    from feat_spark.operators.encoding import theilsen_fit

    # y = 2x exactly except one wild outlier at x=3 — OLS moves, T-S not
    df = spark.createDataFrame(
        [("u", 0, 0), ("u", 1, 2), ("u", 2, 4), ("u", 3, 1000)],
        "g string, x long, y long",
    )
    out = _rows(theilsen_fit(df, "x", "y", "g"))
    assert out[0]["n_pairs"] == 6
    # pairwise slopes: (0,1)=2 (0,2)=2 (0,3)=333.33 (1,2)=2
    # (1,3)=499 (2,3)=996 -> sorted [2,2,2,333.33,499,996], median
    # = (2+333.33..)/2
    exp = (2.0 + 1000.0 / 3.0) / 2.0
    assert abs(out[0]["slope"] - exp) < 1e-6


def test_theilsen_excludes_vertical_and_single_point(spark):
    from feat_spark.operators.encoding import theilsen_fit

    df = spark.createDataFrame(
        [("a", 1, 5), ("a", 1, 9), ("b", 4, 1)],
        "g string, x long, y long",
    )
    # a has only duplicate-x rows (no valid pair), b a single point:
    # both honestly absent
    assert theilsen_fit(df, "x", "y", "g").count() == 0


# ---------------------------------------------------------------- nelson_aalen


def test_nelson_aalen_hand_curve(spark):
    from feat_spark.operators.labels import nelson_aalen

    # durations: t=1 two observed, t=2 one censored, t=3 one observed
    df = spark.createDataFrame(
        [(1, True), (1, True), (2, False), (3, True)],
        "t long, observed boolean",
    )
    out = {r["t"]: r for r in _rows(nelson_aalen(df, "t", "observed"))}
    # H(1) = 2/4 = .5 ; H(2) = .5 + 0/2 ; H(3) = .5 + 1/1 = 1.5
    assert out[1]["n_at_risk"] == 4 and out[1]["cum_hazard"] == 0.5
    assert out[2]["n_at_risk"] == 2 and out[2]["cum_hazard"] == 0.5
    assert out[3]["n_at_risk"] == 1 and out[3]["cum_hazard"] == 1.5
    assert out[2]["c"] == 1 and out[3]["d"] == 1


def test_nelson_aalen_monotone_nondecreasing(spark):
    from feat_spark.operators.labels import nelson_aalen

    rows = [(i % 7, i % 3 != 0) for i in range(60)]
    df = spark.createDataFrame(rows, "t long, observed boolean")
    out = _rows(nelson_aalen(df, "t", "observed"), "t")
    hz = [r["cum_hazard"] for r in out]
    assert hz == sorted(hz)
    assert all(h >= 0 for h in hz)


# ------------------------------------------------------------- item_similarity


def test_item_similarity_hand_cosine(spark):
    from feat_spark.operators.cooccur import item_similarity

    # baskets: {1,2} x3, {1,3} x1, {2,3} x1  (items 1,2,3)
    rows = (
        [(b, 1) for b in (10, 11, 12, 13)]
        + [(b, 2) for b in (10, 11, 12, 14)]
        + [(13, 3), (14, 3)]
    )
    df = spark.createDataFrame(rows, "b long, i long")
    out = _rows(
        item_similarity(df, "b", "i", k=5, min_pairs=1), "item", "rank"
    )
    by = {(r["item"], r["neighbor"]): r for r in out}
    # n_1=4, n_2=4, n_12=3 -> 3/4
    assert abs(by[(1, 2)]["cosine"] - 3 / 4) < 1e-9
    # n_13 = 1 -> 1/sqrt(4*2)
    assert abs(by[(1, 3)]["cosine"] - 1 / math.sqrt(8)) < 1e-9
    # both directions exist, ranked by cosine desc
    assert by[(2, 1)]["rank"] == 1 and by[(3, 1)]["rank"] in (1, 2)


def test_item_similarity_min_pairs_prunes(spark):
    from feat_spark.operators.cooccur import item_similarity

    df = spark.createDataFrame(
        [(1, 7), (1, 8), (2, 7), (2, 9)], "b long, i long"
    )
    out = _rows(item_similarity(df, "b", "i", k=3, min_pairs=2))
    assert out == []  # every pair co-occurs exactly once


def test_item_similarity_dedups_within_basket(spark):
    from feat_spark.operators.cooccur import item_similarity

    # duplicate (basket,item) rows must not inflate counts
    df = spark.createDataFrame(
        [(1, 7), (1, 7), (1, 8), (2, 7), (2, 8)], "b long, i long"
    )
    out = {
        (r["item"], r["neighbor"]): r["n_pairs"]
        for r in _rows(item_similarity(df, "b", "i", k=3, min_pairs=1))
    }
    assert out[(7, 8)] == 2 and out[(8, 7)] == 2


# ------------------------------------------------------------------ hll_rollup


def test_hll_rollup_exact_and_bounds(spark):
    from feat_spark.operators.profile import hll_rollup

    rows = [("a", d % 3, u) for d, u in enumerate(range(200))] + [
        ("b", 0, u) for u in range(40)
    ]
    df = spark.createDataFrame(rows, "g string, sub long, id long")
    out = {r["g"]: r for r in _rows(hll_rollup(df, "g", "sub", "id"))}
    assert out["a"]["exact_distinct"] == 200
    assert out["a"]["n_leaves"] == 3
    assert out["b"]["exact_distinct"] == 40 and out["b"]["n_leaves"] == 1
    assert out["a"]["merged_within_bounds"] is True
    assert out["b"]["merged_within_bounds"] is True


def test_hll_rollup_merge_equals_flat_estimate(spark):
    from feat_spark.operators.profile import hll_rollup

    # union-merged leaf sketches must see the union of ids: ids are
    # disjoint across subgroups so the merged estimate must track the
    # SUM, not any single leaf
    rows = [("g", s, s * 1000 + u) for s in range(4) for u in range(50)]
    df = spark.createDataFrame(rows, "g string, sub long, id long")
    r = _rows(hll_rollup(df, "g", "sub", "id"))[0]
    assert r["exact_distinct"] == 200 and r["n_leaves"] == 4
    assert r["merged_within_bounds"] is True


# ------------------------------------------------------------ recency_features


def test_recency_same_type_and_anchor(spark):
    from feat_spark.operators.eventops import recency_features

    rows = [
        (1, 7, "view", _ts("2024-01-01 00:00:00")),
        (2, 7, "purchase", _ts("2024-01-01 00:01:00")),
        (3, 7, "view", _ts("2024-01-01 00:03:00")),
        (4, 7, "purchase", _ts("2024-01-01 00:10:00")),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = {r["event_id"]: r for r in _rows(recency_features(df))}
    assert out[1]["secs_since_same_type"] is None
    assert out[1]["secs_since_anchor"] is None
    assert out[2]["secs_since_anchor"] is None  # strictly preceding
    assert out[3]["secs_since_same_type"] == 180
    assert out[3]["secs_since_anchor"] == 120
    assert out[4]["secs_since_same_type"] == 540
    assert out[4]["secs_since_anchor"] == 540


def test_recency_is_strictly_backward(spark):
    # a purchase must never see ITSELF as the last anchor — the
    # leakage contract
    from feat_spark.operators.eventops import recency_features

    rows = [
        (1, 1, "purchase", _ts("2024-01-01 00:00:00")),
        (2, 1, "purchase", _ts("2024-01-01 00:00:30")),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = {r["event_id"]: r for r in _rows(recency_features(df))}
    assert out[1]["secs_since_anchor"] is None
    assert out[2]["secs_since_anchor"] == 30


# ------------------------------------------------------------ local_clustering


def test_local_clustering_triangle_plus_tail(spark):
    from feat_spark.operators.graph import local_clustering

    # triangle 1-2-3 plus pendant 3-4
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
    )
    out = {r["node"]: r for r in _rows(local_clustering(df))}
    assert out[1]["coeff"] == 1.0 and out[2]["coeff"] == 1.0
    # node 3: deg 3, one closed pair of three -> 2*1/(3*2)
    assert abs(out[3]["coeff"] - 1 / 3) < 1e-9
    assert out[4]["coeff"] == 0.0 and out[4]["degree"] == 1
    assert out[3]["n_triangles"] == 1


def test_local_clustering_clique_all_ones(spark):
    from feat_spark.operators.graph import local_clustering

    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = _rows(local_clustering(df))
    assert all(r["coeff"] == 1.0 for r in out)
    assert all(r["n_triangles"] == 6 for r in out)  # C(4,2) per node
