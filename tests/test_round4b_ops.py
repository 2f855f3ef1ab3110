"""Late-round-4 operators: SCD-2 builder, pointer-doubling tree
ancestry, n-gram containment, lossless prefix-filter Jaccard join,
BPE pair counting, per-source unigram KL. Hand-computed vectors for
the math; the naive-form cross-checks (prefix filter vs all-pairs,
source_kl closed form vs direct full-vocabulary sum) pin the
scale-path algebra to the definitional one."""

import math

import pytest
from pyspark.sql import functions as F


def _rows(df, *order):
    if order:
        df = df.orderBy(*order)
    return [r.asDict() for r in df.collect()]


# ----------------------------------------------------------------- scd2


def test_scd2_runs_versions_and_intervals(spark):
    from feat_spark.plans.snapshot import scd2_build

    rows = [
        # key 1: a,a,b,a -> three runs
        (1, 10, 1, "a"),
        (1, 20, 2, "a"),
        (1, 30, 3, "b"),
        (1, 40, 4, "a"),
        # key 2: single run
        (2, 15, 5, "x"),
        (2, 25, 6, "x"),
    ]
    df = spark.createDataFrame(rows, "k long, ts long, eid long, attr string")
    out = _rows(
        scd2_build(df, key_col="k", ts_col="ts", attr_cols=["attr"],
                   tiebreak_col="eid"),
        "k", "version",
    )
    k1 = [r for r in out if r["k"] == 1]
    assert [(r["attr"], r["valid_from"], r["valid_to"], r["version"],
             r["is_current"]) for r in k1] == [
        ("a", 10, 30, 1, False),
        ("b", 30, 40, 2, False),
        ("a", 40, None, 3, True),
    ]
    k2 = [r for r in out if r["k"] == 2]
    assert [(r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
            for r in k2] == [("x", 15, None, True)]


def test_scd2_null_attr_opens_run(spark):
    from feat_spark.plans.snapshot import scd2_build

    df = spark.createDataFrame(
        [(1, 10, 1, "a"), (1, 20, 2, None), (1, 30, 3, None), (1, 40, 4, "a")],
        "k long, ts long, eid long, attr string",
    )
    out = _rows(
        scd2_build(df, key_col="k", ts_col="ts", attr_cols=["attr"],
                   tiebreak_col="eid"),
        "version",
    )
    # a | null,null | a -> three runs; NULL->value and value->NULL both flip
    assert [(r["attr"], r["version"]) for r in out] == [
        ("a", 1), (None, 2), ("a", 3)]


# -------------------------------------------------------- tree ancestry


def test_tree_ancestry_chain_and_star(spark):
    from feat_spark.operators.graph import tree_ancestry

    #   0 <- 1 <- 2 <- 3 <- 4 <- 5   (deep chain: doubling needed)
    #   10 <- 11, 10 <- 12           (star)
    #   20                           (lone root)
    rows = [(0, None), (1, 0), (2, 1), (3, 2), (4, 3), (5, 4),
            (10, None), (11, 10), (12, 10), (20, None)]
    df = spark.createDataFrame(rows, "id long, parent_id long")
    out = {r["id"]: (r["root_id"], r["depth"])
           for r in tree_ancestry(df, max_iters=10).collect()}
    assert out[0] == (0, 0)
    assert out[5] == (0, 5)
    assert out[3] == (0, 3)
    assert out[11] == (10, 1)
    assert out[20] == (20, 0)


def test_tree_ancestry_orphan_parent_is_null(spark):
    from feat_spark.operators.graph import tree_ancestry

    df = spark.createDataFrame(
        [(1, 99), (2, 1)], "id long, parent_id long"
    )  # 99 not a node
    out = {r["id"]: (r["root_id"], r["depth"])
           for r in tree_ancestry(df).collect()}
    assert out[1] == (None, None)
    assert out[2] == (None, None)


def test_tree_ancestry_log_rounds(spark):
    from feat_spark.operators.graph import tree_ancestry

    # depth-60 chain resolves within ceil(log2(60))+1 = 7 rounds
    rows = [(0, None)] + [(i, i - 1) for i in range(1, 61)]
    df = spark.createDataFrame(rows, "id long, parent_id long")
    out = {r["id"]: r["depth"]
           for r in tree_ancestry(df, max_iters=8).collect()}
    assert out[60] == 60 and out[1] == 1


# ---------------------------------------------------------- containment


def test_containment_directional(spark):
    from feat_spark.operators.dedup import containment_pairs

    # B = prefix of A: shingles(B) subset of shingles(A)
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e")],
        "doc_id long, text string",
    )
    out = {(r["id_a"], r["id_b"]): r["containment"]
           for r in containment_pairs(df, n=3, threshold=0.0).collect()}
    assert out[(2, 1)] == pytest.approx(1.0)       # B fully inside A
    assert out[(1, 2)] == pytest.approx(0.75)      # 3 of A's 4 shingles
    hi = containment_pairs(df, n=3, threshold=0.8).collect()
    assert [(r["id_a"], r["id_b"]) for r in hi] == [(2, 1)]


# -------------------------------------------------------- prefix filter


def test_prefix_filter_matches_naive_all_pairs(spark):
    from feat_spark.operators.dedup import (
        prefix_filter_pairs,
        shingle_jaccard_pairs,
    )

    docs = [
        (1, "red green blue yellow"),
        (2, "red green blue yellow extra"),     # J = 4/5 vs 1
        (3, "red cyan magenta black white"),    # shares 'red' only
        (4, "alpha beta gamma delta"),
        (5, "alpha beta gamma delta"),          # J = 1 vs 4
        (6, "one two"),
        (7, "two three"),                       # J = 1/3
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fast = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in prefix_filter_pairs(df, threshold=0.6).collect()}
    naive = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in shingle_jaccard_pairs(df, n=1, threshold=0.6).collect()}
    assert fast == naive                        # losslessness
    assert fast[(1, 2)] == pytest.approx(0.8)
    assert fast[(4, 5)] == pytest.approx(1.0)
    assert (6, 7) not in fast


# ------------------------------------------------------------------ bpe


def test_bpe_pair_counts_weighted(spark):
    from feat_spark.operators.keywords import bpe_pair_counts

    # one doc: words aba(x2), ab(x1); pairs: aba -> ab, ba
    df = spark.createDataFrame([(1, "aba aba ab")], "doc_id long, text string")
    out = [(r["pair"], r["count"]) for r in bpe_pair_counts(df, k=10).collect()]
    assert out == [("ab", 3), ("ba", 2)]


def test_bpe_single_char_words_skipped(spark):
    from feat_spark.operators.keywords import bpe_pair_counts

    df = spark.createDataFrame([(1, "a b ccc")], "doc_id long, text string")
    out = [(r["pair"], r["count"]) for r in bpe_pair_counts(df, k=10).collect()]
    assert out == [("cc", 2)]


# ------------------------------------------------------------ source_kl


def _kl_direct(strata: dict[str, list[str]]) -> dict[str, float]:
    """Definitional KL over the FULL smoothed vocabulary — validates
    the operator's absent-mass closed form."""
    from collections import Counter

    glob = Counter(w for ws in strata.values() for w in ws)
    vocab = sorted(glob)
    v, n = len(vocab), sum(glob.values())
    out = {}
    for s, ws in strata.items():
        c = Counter(ws)
        ns = len(ws)
        kl = 0.0
        for w in vocab:
            p = (c[w] + 1.0) / (ns + v)
            q = (glob[w] + 1.0) / (n + v)
            kl += p * math.log(p / q)
        out[s] = kl
    return out


def test_source_kl_matches_direct_sum(spark):
    from feat_spark.operators.mixture import source_kl

    strata = {
        "news": "the cat sat on the mat the end".split(),
        "code": "def foo return def bar return x".split(),
        "mix": "the cat def foo on mat".split(),
    }
    df = spark.createDataFrame(
        [(s, " ".join(ws)) for s, ws in strata.items()],
        "source string, text string",
    )
    got = {r["source"]: r["kl"] for r in source_kl(df).collect()}
    want = _kl_direct(strata)
    for s in strata:
        assert got[s] == pytest.approx(want[s], abs=1e-6), s
    # disjoint-vocab strata diverge more than overlapping ones
    assert got["news"] > got["mix"] and got["code"] > got["mix"]


def test_source_kl_single_stratum_is_zero(spark):
    from feat_spark.operators.mixture import source_kl

    df = spark.createDataFrame(
        [("only", "a b c a b a")], "source string, text string"
    )
    out = source_kl(df).collect()[0]
    assert out["kl"] == pytest.approx(0.0, abs=1e-9)
    assert out["n_tokens"] == 6 and out["n_types"] == 3
