"""Late-round-4 batch C operators: per-group autocorrelation,
degree-ordered triangle counting, int8 embedding quantization,
calibration curve, chi-square association, reciprocal-rank fusion,
type-1 CDC upsert. Hand-computed vectors for the math; canonical
small graphs / tables for the set semantics."""

import math

import pytest
from pyspark.sql import functions as F


def _rows(df, *order):
    if order:
        df = df.orderBy(*order)
    return [r.asDict() for r in df.collect()]


# --------------------------------------------------------- autocorrelation


def test_autocorr_perfect_and_anti(spark):
    from feat_spark.operators.encoding import autocorrelation

    rows = [("a", i, v) for i, v in enumerate([1, 2, 3, 4, 5])] + [
        ("b", i, v) for i, v in enumerate([1, 2, 1, 2, 1])
    ]
    df = spark.createDataFrame(rows, "g string, i long, v long")
    out = {r["g"]: r for r in _rows(autocorrelation(df, "g", ["i"], "v", lag=1))}
    # linear ramp: lag-1 pairs are perfectly correlated
    assert out["a"]["n_pairs"] == 4
    assert out["a"]["acf"] == pytest.approx(1.0)
    # alternating series: perfectly anti-correlated
    assert out["b"]["acf"] == pytest.approx(-1.0)
    assert out["a"]["lag"] == 1


def test_autocorr_degenerate_null(spark):
    from feat_spark.operators.encoding import autocorrelation

    df = spark.createDataFrame(
        [("c", 0, 7), ("c", 1, 7), ("c", 2, 7), ("d", 0, 1)],
        "g string, i long, v long",
    )
    out = {r["g"]: r for r in _rows(autocorrelation(df, "g", ["i"], "v", lag=1))}
    # constant series: zero variance -> NULL acf
    assert out["c"]["acf"] is None
    # single row: no aligned pairs -> no output row at all
    assert "d" not in out


def test_autocorr_lag2_alternating_is_positive(spark):
    from feat_spark.operators.encoding import autocorrelation

    df = spark.createDataFrame(
        [("b", i, v) for i, v in enumerate([1, 2, 1, 2, 1, 2])],
        "g string, i long, v long",
    )
    out = _rows(autocorrelation(df, "g", ["i"], "v", lag=2))
    assert out[0]["acf"] == pytest.approx(1.0)


# ----------------------------------------------------------- triangle_count


def test_triangle_count_two_shared_triangles(spark):
    from feat_spark.operators.graph import triangle_count

    # triangles {1,2,3} and {2,3,4}; a duplicate reversed edge and a
    # self-loop must be canonicalized away
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (2, 4), (2, 1), (4, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r["n_triangles"] for r in _rows(triangle_count(df))}
    assert out == {1: 1, 2: 2, 3: 2, 4: 1}


def test_triangle_count_triangle_free_graph(spark):
    from feat_spark.operators.graph import triangle_count

    # a 4-cycle has no triangles; every node still gets a zero row
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    out = {r["node"]: r["n_triangles"] for r in _rows(triangle_count(df))}
    assert out == {1: 0, 2: 0, 3: 0, 4: 0}


def test_triangle_count_k4(spark):
    from feat_spark.operators.graph import triangle_count

    # K4: C(3,2) = 3 triangles per node, 4 triangles total
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = _rows(triangle_count(df))
    assert [r["n_triangles"] for r in out] == [3, 3, 3, 3]


# ------------------------------------------------------ quantize_embeddings


def test_quantize_embeddings_affine_and_constant_dim(spark):
    from feat_spark.operators.vectors import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [0.0, 10.0]), (2, [5.0, 10.0]), (3, [10.0, 10.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r["codes"] for r in _rows(quantize_embeddings(df))}
    # dim 0 spans [0, 10]: 0 -> 0, 5 -> floor(127.5) = 127, 10 -> 255
    # dim 1 is constant -> code 0
    assert out == {1: [0, 0], 2: [127, 0], 3: [255, 0]}


def test_quantize_embeddings_frozen_params(spark):
    from feat_spark.operators.vectors import dimension_params, quantize_embeddings

    train = spark.createDataFrame(
        [(1, [0.0]), (2, [10.0])], "vec_id long, embedding array<float>"
    )
    serve = spark.createDataFrame(
        [(9, [20.0])], "vec_id long, embedding array<float>"
    )
    p = dimension_params(train)
    out = _rows(quantize_embeddings(serve, params=p))
    # out-of-range serve value clamps to the top code
    assert out[0]["codes"] == [255]


# -------------------------------------------------------- calibration_curve


def test_calibration_curve_bins_and_clamp(spark):
    from feat_spark.operators.experiment import calibration_curve

    rows = [(0.05, 0), (0.05, 1), (0.95, 1), (1.0, 1)]
    df = spark.createDataFrame(rows, "score double, y long")
    out = {r["bin"]: r for r in _rows(calibration_curve(df, "score", "y"))}
    assert set(out) == {0, 9}
    assert out[0]["n"] == 2
    assert out[0]["mean_score"] == pytest.approx(0.05)
    assert out[0]["frac_pos"] == pytest.approx(0.5)
    # score exactly 1.0 clamps into the top bin
    assert out[9]["n"] == 2
    assert out[9]["mean_score"] == pytest.approx(0.975)
    assert out[9]["frac_pos"] == pytest.approx(1.0)


# --------------------------------------------------------------- chi2_assoc


def test_chi2_perfect_and_independent(spark):
    from feat_spark.operators.profile import chi2_assoc

    rows = [("a", 0)] * 10 + [("b", 1)] * 10
    df = spark.createDataFrame(rows, "x string, y long")
    out = _rows(chi2_assoc(df, ["x"], "y"))
    # perfect 2x2 association: chi2 = n = 20, dof = 1
    assert out[0]["chi2"] == pytest.approx(20.0)
    assert out[0]["dof"] == 1
    assert out[0]["n_rows"] == 20
    assert out[0]["n_cells"] == 2  # only observed cells materialize

    indep = [("a", 0)] * 5 + [("a", 1)] * 5 + [("b", 0)] * 5 + [("b", 1)] * 5
    df2 = spark.createDataFrame(indep, "x string, y long")
    out2 = _rows(chi2_assoc(df2, ["x"], "y"))
    assert out2[0]["chi2"] == pytest.approx(0.0)


def test_chi2_null_is_its_own_category(spark):
    from feat_spark.operators.profile import chi2_assoc

    rows = [("a", 0)] * 5 + [(None, 1)] * 5
    df = spark.createDataFrame(rows, "x string, y long")
    out = _rows(chi2_assoc(df, ["x"], "y"))
    # NULL vs 'a' perfectly separates the label -> chi2 = n
    assert out[0]["chi2"] == pytest.approx(10.0)
    assert out[0]["dof"] == 1


# ----------------------------------------------------------------- rrf_fuse


def test_rrf_fuse_scores_and_rank(spark):
    from feat_spark.operators.keywords import rrf_fuse

    la = spark.createDataFrame(
        [("q", "d1", 1), ("q", "d2", 2), ("q", "d3", 3)],
        "query_id string, doc_id string, rank long",
    )
    lb = spark.createDataFrame(
        [("q", "d3", 1), ("q", "d2", 2), ("q", "d4", 3)],
        "query_id string, doc_id string, rank long",
    )
    out = {r["doc"]: r for r in _rows(rrf_fuse([la, lb]))}
    assert out["d3"]["rrf"] == pytest.approx(1 / 61 + 1 / 63, abs=1e-9)
    assert out["d2"]["rrf"] == pytest.approx(2 / 62, abs=1e-9)
    assert out["d2"]["n_lists"] == 2 and out["d1"]["n_lists"] == 1
    # 1/61 + 1/63 > 2/62 (AM-HM): d3 outranks d2
    order = sorted(out.values(), key=lambda r: r["fused_rank"])
    assert [r["doc"] for r in order] == ["d3", "d2", "d1", "d4"]


def test_rrf_fuse_topn(spark):
    from feat_spark.operators.keywords import rrf_fuse

    la = spark.createDataFrame(
        [("q", "d%d" % i, i) for i in range(1, 6)],
        "query_id string, doc_id string, rank long",
    )
    out = _rows(rrf_fuse([la], topn=2))
    assert len(out) == 2
    assert [r["doc"] for r in sorted(out, key=lambda r: r["fused_rank"])] == [
        "d1",
        "d2",
    ]


# ------------------------------------------------------------- upsert_latest


def test_upsert_latest_update_delete_insert(spark):
    from feat_spark.plans.snapshot import upsert_latest

    base = spark.createDataFrame(
        [(1, 100, "v1"), (2, 100, "v2"), (3, 100, "v3")],
        "k long, ts long, val string",
    )
    changes = spark.createDataFrame(
        [
            (2, 50, "v2b", "U"),   # older ts than base — change still wins
            (3, 200, "gone", "D"),
            (4, 10, "v4", "U"),    # insert
        ],
        "k long, ts long, val string, op string",
    )
    out = _rows(
        upsert_latest(base, changes, key_col="k", ts_col="ts", op_col="op"),
        "k",
    )
    assert [(r["k"], r["val"]) for r in out] == [
        (1, "v1"),
        (2, "v2b"),
        (4, "v4"),
    ]


def test_upsert_latest_recency_and_tiebreak_among_changes(spark):
    from feat_spark.plans.snapshot import upsert_latest

    base = spark.createDataFrame([(1, 0, "old")], "k long, ts long, val string")
    changes = spark.createDataFrame(
        [
            (1, 10, "a", "U", 1),
            (1, 20, "b", "U", 1),   # latest ts wins
            (1, 20, "c", "U", 2),   # same ts: higher tiebreak wins
        ],
        "k long, ts long, val string, op string, seq long",
    )
    out = _rows(
        upsert_latest(
            base, changes, key_col="k", ts_col="ts", op_col="op",
            tiebreak_col="seq",
        )
    )
    assert [(r["k"], r["val"]) for r in out] == [(1, "c")]


# ------------------------------------------------------------ assemble_context


def test_assemble_context_hand_vector(spark):
    from feat_spark.operators.packing import assemble_context

    df = spark.createDataFrame(
        [("a", 1, 5), ("a", 2, 10), ("a", 3, 3), ("a", 4, 8)],
        "k string, i long, tok long",
    )
    out = _rows(
        assemble_context(df, "k", ["i"], "tok", budget=12), "turn_idx"
    )
    got = [
        (r["turn_idx"], r["n_context"], r["context_tokens"]) for r in out
    ]
    # budget 12: turn 2 (10 tok) can't also hold turn 1 (5); turn 4 (8)
    # holds turn 3 (3) for 11 <= 12
    assert got == [(1, 1, 5), (2, 1, 10), (3, 1, 3), (4, 2, 11)]
    assert [r["cum_tokens"] for r in out] == [5, 15, 18, 26]


def test_assemble_context_loose_budget_and_oversize_turn(spark):
    from feat_spark.operators.packing import assemble_context

    df = spark.createDataFrame(
        [("a", 1, 5), ("a", 2, 10), ("b", 1, 99)],
        "k string, i long, tok long",
    )
    out = {
        (r["k"], r["turn_idx"]): r
        for r in _rows(assemble_context(df, "k", ["i"], "tok", budget=50))
    }
    # whole history fits: n_context = turn_idx
    assert out[("a", 2)]["n_context"] == 2
    assert out[("a", 2)]["context_tokens"] == 15
    # single turn larger than the budget: context is itself, tokens
    # exceed the budget (the truncation-needed signal)
    assert out[("b", 1)]["n_context"] == 1
    assert out[("b", 1)]["context_tokens"] == 99


def test_assemble_context_matches_quadratic_reference(spark):
    from feat_spark.operators.packing import assemble_context

    import random

    rng = random.Random(7)
    rows = []
    for k in ("u", "v"):
        for i in range(40):
            rows.append((k, i, rng.randint(1, 30)))
    df = spark.createDataFrame(rows, "k string, i long, tok long")
    out = {
        (r["k"], r["turn_idx"]): (r["n_context"], r["context_tokens"])
        for r in _rows(assemble_context(df, "k", ["i"], "tok", budget=60))
    }
    # quadratic reference
    for k in ("u", "v"):
        toks = [t for kk, _, t in rows if kk == k]
        cum = [0]
        for t in toks:
            cum.append(cum[-1] + t)
        for i in range(1, len(toks) + 1):
            n = 0
            for j in range(i, 0, -1):
                if cum[i] - cum[j - 1] <= 60:
                    n = i - j + 1
                else:
                    break
            n = max(n, 1)
            ctx = cum[i] - cum[i - n]
            assert out[(k, i)] == (n, ctx), (k, i)


# ---------------------------------------------------------- cross_correlation


def test_cross_correlation_detects_lead(spark):
    from feat_spark.operators.encoding import cross_correlation

    # y is x delayed by one step (with noise-free copy): corr at
    # shift +1 must be exactly 1
    x = [1, 5, 2, 8, 3, 9, 4]
    y = [0] + x[:-1]
    rows = [("g", t, a, b) for t, (a, b) in enumerate(zip(x, y))]
    df = spark.createDataFrame(rows, "g string, t long, x long, y long")
    out = {
        r["shift"]: r
        for r in _rows(cross_correlation(df, "g", "t", "x", "y"))
    }
    assert out[1]["xcorr"] == pytest.approx(1.0)
    assert out[1]["n_pairs"] == 6
    assert abs(out[0]["xcorr"]) < 1.0


def test_cross_correlation_degenerate(spark):
    from feat_spark.operators.encoding import cross_correlation

    df = spark.createDataFrame(
        [("g", t, 5, t) for t in range(4)], "g string, t long, x long, y long"
    )
    out = {
        r["shift"]: r
        for r in _rows(cross_correlation(df, "g", "t", "x", "y", shifts=(0,)))
    }
    # constant x: zero variance -> NULL
    assert out[0]["xcorr"] is None


# -------------------------------------------------------------- phrase_search


def test_phrase_search_anchors_and_counts(spark):
    from feat_spark.operators.keywords import phrase_search

    df = spark.createDataFrame(
        [
            (1, "a b a b a"),
            (2, "b a b"),
            (3, "c c c"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in _rows(phrase_search(df, "a b"))}
    assert set(out) == {1, 2}
    assert (out[1]["n_matches"], out[1]["first_pos"]) == (2, 0)
    assert (out[2]["n_matches"], out[2]["first_pos"]) == (1, 1)


def test_phrase_search_three_words_and_repeats(spark):
    from feat_spark.operators.keywords import phrase_search

    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "a a a")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in _rows(phrase_search(df, "a b a"))}
    assert set(out) == {1}
    assert (out[1]["n_matches"], out[1]["first_pos"]) == (2, 0)
    # repeated-term phrase on a run of the same word
    out2 = {r["doc_id"]: r for r in _rows(phrase_search(df, "a a"))}
    assert (out2[2]["n_matches"], out2[2]["first_pos"]) == (2, 0)
    assert 1 not in out2


def test_phrase_search_no_match_empty(spark):
    from feat_spark.operators.keywords import phrase_search

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    assert phrase_search(df, "c a").count() == 0


# ----------------------------------------------------------- seasonal_anomaly


def test_seasonal_anomaly_flags_spike_within_dow(spark):
    from feat_spark.operators.profile import seasonal_anomaly
    import datetime

    # user u: five consecutive Mondays with 2 events, one Monday with
    # 40 -> that Monday is anomalous vs the Monday baseline
    rows = []
    base = datetime.datetime(2024, 1, 1)  # a Monday
    for wk in range(6):
        n = 40 if wk == 5 else 2
        for j in range(n):
            rows.append(("u", base + datetime.timedelta(weeks=wk, minutes=j)))
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = _rows(seasonal_anomaly(df, "user_id"), "day")
    assert len(out) == 6
    assert [r["n"] for r in out] == [2, 2, 2, 2, 2, 40]
    assert all(r["dow"] == out[0]["dow"] for r in out)
    flags = [r["is_anomaly"] for r in out]
    assert flags == [False] * 5 + [True]


def test_seasonal_anomaly_constant_weekday_no_flag(spark):
    from feat_spark.operators.profile import seasonal_anomaly
    import datetime

    rows = []
    base = datetime.datetime(2024, 1, 2)
    for wk in range(4):
        for j in range(3):
            rows.append(("u", base + datetime.timedelta(weeks=wk, minutes=j)))
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = _rows(seasonal_anomaly(df, "user_id"))
    # perfectly regular: MAD = 0 -> NULL z, never flagged
    assert all(r["robust_z"] is None for r in out)
    assert not any(r["is_anomaly"] for r in out)
