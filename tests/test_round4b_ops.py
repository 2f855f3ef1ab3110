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


# ------------------------------------------------------- weighted median


def test_weighted_median_exact(spark):
    from feat_spark.operators.encoding import weighted_median

    # group g: values 1(w3), 5(w1), 9(w2): W=6, cum: 1->3, 5->4, 9->6
    # 2*cum>=6 first at value 5? 2*3=6 >= 6 -> value 1 IS the lower
    # weighted median (cum rule hits at the first value already)
    rows = [("g", 1, 3), ("g", 5, 1), ("g", 9, 2),
            ("h", 10, 1), ("h", 20, 9)]
    df = spark.createDataFrame(rows, "k string, v long, w long")
    out = {r["k"]: r["weighted_median"]
           for r in weighted_median(df, ["k"], "v", "w").collect()}
    assert out["g"] == 1
    assert out["h"] == 20          # weight mass sits on 20


def test_weighted_median_matches_repeat_expansion(spark):
    from feat_spark.operators.encoding import weighted_median

    # weighted median == plain median of the weight-expanded list
    import statistics
    rows = [("a", 3, 2), ("a", 7, 3), ("a", 11, 1)]
    expanded = [3, 3, 7, 7, 7, 11]
    df = spark.createDataFrame(rows, "k string, v long, w long")
    got = weighted_median(df, ["k"], "v", "w").collect()[0]["weighted_median"]
    assert got == statistics.median_low(expanded)


# ---------------------------------------------------------------- ks_test


def test_ks_identical_distributions_zero(spark):
    from feat_spark.operators.experiment import ks_test

    rows = [("a", v) for v in [1, 2, 3, 4]] + [("b", v) for v in [1, 2, 3, 4]]
    df = spark.createDataFrame(rows, "g string, v long")
    out = ks_test(df, "g", "v", "a", "b").collect()[0]
    assert out["d_stat"] == 0.0 and out["n_a"] == 4 and out["n_b"] == 4


def test_ks_textbook_value(spark):
    from feat_spark.operators.experiment import ks_test

    a = [1, 2, 3, 4, 5]
    b = [3, 4, 5, 6, 7]
    df = spark.createDataFrame(
        [("a", v) for v in a] + [("b", v) for v in b], "g string, v long"
    )
    out = ks_test(df, "g", "v", "a", "b").collect()[0]
    # CDFs diverge most at v=2: F_a=2/5, F_b=0 -> D=0.4
    assert out["d_stat"] == pytest.approx(0.4)


def test_ks_disjoint_is_one(spark):
    from feat_spark.operators.experiment import ks_test

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 10), ("b", 11)], "g string, v long"
    )
    out = ks_test(df, "g", "v", "a", "b").collect()[0]
    assert out["d_stat"] == pytest.approx(1.0)


# ------------------------------------------------------------ mutual info


def test_mutual_information_perfect_and_independent(spark):
    from feat_spark.operators.profile import mutual_information

    # f_perf == label exactly -> MI = H(label) = ln 2 (balanced binary)
    # f_indep constant -> MI = 0
    rows = [(str(i % 2), "c", str(i % 2)) for i in range(8)]
    df = spark.createDataFrame(rows, "f_perf string, f_indep string, y string")
    out = {r["feature"]: r for r in
           mutual_information(df, ["f_perf", "f_indep"], "y").collect()}
    assert out["f_perf"]["mi"] == pytest.approx(math.log(2), abs=1e-6)
    assert out["f_indep"]["mi"] == pytest.approx(0.0, abs=1e-9)
    assert out["f_perf"]["n_rows"] == 8


def test_mutual_information_null_is_category(spark):
    from feat_spark.operators.profile import mutual_information

    # NULL feature value perfectly predicts label=1
    rows = [(None, "1")] * 4 + [("x", "0")] * 4
    df = spark.createDataFrame(rows, "f string, y string")
    out = mutual_information(df, ["f"], "y").collect()[0]
    assert out["mi"] == pytest.approx(math.log(2), abs=1e-6)
    assert out["n_cells"] == 2


# ------------------------------------------------- semantic decontamination


def test_semantic_decontaminate_flags_planted(spark):
    from feat_spark.operators.similarity import semantic_decontaminate

    bench = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    corpus = spark.createDataFrame(
        [(10, [0.9, 0.1]),     # close to bench 1
         (11, [-1.0, 0.0]),    # anti-parallel: cos -1
         (12, [1.0, 1.0])],    # 45 deg: cos ~0.707 to both, tie -> bench 1
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: (r["vec_id_bench"], r["cos_sim"])
           for r in semantic_decontaminate(
               corpus, bench, corpus_id="vec_id", bench_id="vec_id",
               threshold=0.7).collect()}
    assert 11 not in out
    assert out[10][0] == 1
    assert out[12][0] == 1         # deterministic tie to smallest id
    assert out[12][1] == pytest.approx(0.707107, abs=1e-6)


# --------------------------------------------------- rare category collapse


def test_rare_category_collapse(spark):
    from feat_spark.operators.encoding import rare_category_collapse

    rows = [(i, "big") for i in range(5)] + [(99, "tiny"), (100, None)]
    df = spark.createDataFrame(rows, "id long, cat string")
    out = {r["id"]: r["cat_collapsed"]
           for r in rare_category_collapse(df, "cat", min_count=3).collect()}
    assert out[0] == "big"
    assert out[99] == "__other__"
    assert out[100] is None        # NULL stays NULL


# --------------------------------------------------------------- woe


def test_woe_encode_textbook(spark):
    from feat_spark.operators.encoding import woe_encode

    # cat A: 3 pos / 1 neg; cat B: 1 pos / 3 neg; totals 4/4
    rows = [("A", 1)] * 3 + [("A", 0)] + [("B", 1)] + [("B", 0)] * 3
    df = spark.createDataFrame(rows, "cat string, y long")
    out = {r["category"]: r for r in woe_encode(df, "cat", "y", 0.5).collect()}
    pr_a, nr_a = 3.5 / 5.0, 1.5 / 5.0
    woe_a = math.log(pr_a / nr_a)
    assert out["A"]["woe"] == pytest.approx(woe_a, abs=1e-6)
    assert out["A"]["iv"] == pytest.approx((pr_a - nr_a) * woe_a, abs=1e-6)
    # symmetric label flip -> symmetric woe
    assert out["B"]["woe"] == pytest.approx(-woe_a, abs=1e-6)
    assert out["A"]["n_pos"] == 3 and out["A"]["n_neg"] == 1


def test_woe_empty_cell_is_finite(spark):
    from feat_spark.operators.encoding import woe_encode

    df = spark.createDataFrame(
        [("A", 1), ("A", 1), ("B", 0)], "cat string, y long"
    )
    out = {r["category"]: r["woe"] for r in woe_encode(df, "cat", "y").collect()}
    assert all(v is not None and math.isfinite(v) for v in out.values())


# ----------------------------------------------------- session ngrams


def test_session_ngrams_counts(spark):
    from feat_spark.operators.funnel import session_ngrams

    # user 1: a b c a b c -> 3-grams: abc, bca, cab, abc
    # user 2: a b c       -> abc
    rows = [(1, i, t) for i, t in enumerate("abcabc")] + [
        (2, i, t) for i, t in enumerate("abc")
    ]
    df = spark.createDataFrame(rows, "u long, ts long, ev string")
    out = {r["ngram"]: r["count"] for r in session_ngrams(
        df, ["u"], "ev", ["ts"], n=3, k=10).collect()}
    assert out["a > b > c"] == 3
    assert out["b > c > a"] == 1
    assert out["c > a > b"] == 1
    assert len(out) == 3


def test_session_ngrams_short_sessions_skipped(spark):
    from feat_spark.operators.funnel import session_ngrams

    df = spark.createDataFrame([(1, 0, "a"), (1, 1, "b")], "u long, ts long, ev string")
    assert session_ngrams(df, ["u"], "ev", ["ts"], n=3, k=10).count() == 0


# ---------------------------------------------------- inverted index


def test_inverted_index_positions_and_df(spark):
    from feat_spark.operators.keywords import build_inverted_index

    df = spark.createDataFrame(
        [(1, "to be or not to be"), (2, "be fast")],
        "doc_id long, text string",
    )
    out = {r["word"]: r for r in build_inverted_index(df).collect()}
    be = out["be"]
    assert be["df"] == 2 and be["n_postings"] == 3
    postings = [(p["doc_id"], list(p["positions"])) for p in be["postings"]]
    assert postings == [(1, [1, 5]), (2, [0])]
    assert out["to"]["postings"][0]["positions"] == [0, 4]


def test_inverted_index_stopword_gate(spark):
    from feat_spark.operators.keywords import build_inverted_index

    # 'the' in all 4 docs (ratio 1.0 > 0.5: dropped); 'cat' in 2/4
    # (exactly 0.5: kept); 'dog' in 1 doc (under min_df: dropped)
    df = spark.createDataFrame(
        [(1, "the cat"), (2, "the dog"), (3, "the cat"), (4, "the")],
        "doc_id long, text string",
    )
    out = {r["word"] for r in build_inverted_index(
        df, min_df=2, max_df_ratio=0.5).collect()}
    assert out == {"cat"}
