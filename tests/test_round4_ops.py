"""Round-4 operators: Welch t-test, BM25 keywords, rolling median,
canonical survivor selection. Each test pins semantics against a
hand-computed vector (the oracle gates cover engine parity; these
cover the math and the edge cases)."""

import math

import pytest
from pyspark.sql import functions as F


def _rows(df):
    return [r.asDict() for r in df.collect()]


# ---------------------------------------------------------------- welch


def test_welch_ttest_textbook(spark):
    # classic unequal-variance vector: control tight around 10,
    # treatment wide around 13
    c = [10.0, 10.5, 9.5, 10.2, 9.8]
    t = [13.0, 16.0, 10.0, 14.0, 12.0]
    from feat_spark.operators.experiment import welch_ttest

    df = spark.createDataFrame(
        [("c", v) for v in c] + [("t", v) for v in t], "variant string, y double"
    )
    out = _rows(welch_ttest(df, "variant", "y", control="c", treatment="t"))[0]

    mc, mt = sum(c) / len(c), sum(t) / len(t)
    vc = sum((x - mc) ** 2 for x in c) / (len(c) - 1)
    vt = sum((x - mt) ** 2 for x in t) / (len(t) - 1)
    se2 = vc / len(c) + vt / len(t)
    t_stat = (mt - mc) / math.sqrt(se2)
    dof = se2 * se2 / (
        (vc / len(c)) ** 2 / (len(c) - 1) + (vt / len(t)) ** 2 / (len(t) - 1)
    )
    assert out["n_c"] == 5 and out["n_t"] == 5
    assert out["mean_c"] == pytest.approx(mc, abs=1e-6)
    assert out["diff"] == pytest.approx(mt - mc, abs=1e-6)
    assert out["t_stat"] == pytest.approx(t_stat, abs=1e-6)
    assert out["dof"] == pytest.approx(dof, abs=1e-6)
    # Welch dof must sit strictly between min(n)-1 and n_c+n_t-2
    assert 4 < out["dof"] < 8


def test_welch_ttest_degenerate_arm_is_null(spark):
    from feat_spark.operators.experiment import welch_ttest

    df = spark.createDataFrame(
        [("c", 1.0), ("c", 2.0), ("t", 5.0)], "variant string, y double"
    )
    out = _rows(welch_ttest(df, "variant", "y", control="c", treatment="t"))[0]
    assert out["n_t"] == 1
    assert out["t_stat"] is None and out["dof"] is None
    assert out["mean_t"] == pytest.approx(5.0)


# ----------------------------------------------------------------- bm25


def test_bm25_length_norm_and_saturation(spark):
    # 'rare' appears once in a SHORT doc and once in a LONG doc ->
    # same tf, same idf, but BM25 must rank it higher in the short doc
    from feat_spark.operators.keywords import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "rare alpha"),
            (2, "rare " + " ".join(f"filler{i}" for i in range(30))),
            (3, "alpha beta beta gamma"),
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, k=50)
    scores = {
        (r["doc_id"], r["word"]): r["bm25"] for r in _rows(out)
    }
    assert scores[(1, "rare")] > scores[(2, "rare")]
    # saturation: doubling tf must gain less than double the score
    d = spark.createDataFrame(
        [(1, "x y"), (2, "x x y"), (3, "z")], "doc_id long, text string"
    )
    s = {(r["doc_id"], r["word"]): r["bm25"] for r in _rows(bm25_topk(d, k=50))}
    assert s[(2, "x")] < 2 * s[(1, "x")]
    assert s[(2, "x")] > s[(1, "x")]


def test_bm25_rank_ties_break_by_word(spark):
    from feat_spark.operators.keywords import bm25_topk

    docs = spark.createDataFrame(
        [(1, "bb aa"), (2, "cc dd")], "doc_id long, text string"
    )
    out = [r for r in _rows(bm25_topk(docs, k=2)) if r["doc_id"] == 1]
    out.sort(key=lambda r: r["rank"])
    # identical tf/df/dl -> identical score -> word-ascending rank
    assert [r["word"] for r in out] == ["aa", "bb"]


# -------------------------------------------------------- rolling median


def test_rolling_median_exact_frames(spark):
    from feat_spark.operators.rolling import rolling_median

    rows = [(1, i, v) for i, v in enumerate([1, 100, 3, 5, 2])]
    df = spark.createDataFrame(rows, "g long, i long, v long")
    out = {
        r["i"]: r["rolling_median"]
        for r in _rows(rolling_median(df, "g", ["i"], "v", window_rows=3))
    }
    # frames: [1], [1,100], [1,100,3], [100,3,5], [3,5,2]
    assert out == {0: 1.0, 1: 50.5, 2: 3.0, 3: 5.0, 4: 3.0}


def test_rolling_median_partitions_do_not_leak(spark):
    from feat_spark.operators.rolling import rolling_median

    df = spark.createDataFrame(
        [(1, 0, 10), (1, 1, 20), (2, 0, 1000)], "g long, i long, v long"
    )
    out = {
        (r["g"], r["i"]): r["rolling_median"]
        for r in _rows(rolling_median(df, "g", ["i"], "v", window_rows=5))
    }
    assert out[(2, 0)] == 1000.0
    assert out[(1, 1)] == 15.0


def test_rolling_median_rejects_empty_window(spark):
    from feat_spark.operators.rolling import rolling_median

    df = spark.createDataFrame([(1, 0, 1)], "g long, i long, v long")
    with pytest.raises(ValueError):
        rolling_median(df, "g", ["i"], "v", window_rows=0)


# ------------------------------------------------------------ canonical


def test_canonical_docs_longest_then_smallest_id(spark):
    from feat_spark.operators.dedup import canonical_docs

    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (9, 7)], "doc_id long, component long"
    )
    docs = spark.createDataFrame(
        [
            (1, "short"),
            (2, "the longest document"),
            (3, "mid text"),
            (7, "same length"),
            (9, "same length"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in _rows(canonical_docs(comps, docs))}
    assert out[1]["canonical_id"] == 2 and not out[1]["is_canonical"]
    assert out[2]["is_canonical"]
    # equal lengths -> smallest id survives
    assert out[7]["canonical_id"] == 7 and out[7]["is_canonical"]
    assert out[9]["canonical_id"] == 7 and not out[9]["is_canonical"]
    # exactly one canonical per component
    assert sum(r["is_canonical"] for r in out.values()) == 2


def test_canonical_docs_precomputed_length_col(spark):
    from feat_spark.operators.dedup import canonical_docs

    comps = spark.createDataFrame([(1, 1), (2, 1)], "doc_id long, component long")
    docs = spark.createDataFrame([(1, 3), (2, 99)], "doc_id long, n_chars long")
    out = {
        r["doc_id"]: r["canonical_id"]
        for r in _rows(canonical_docs(comps, docs, length_col="n_chars"))
    }
    assert out == {1: 2, 2: 2}
