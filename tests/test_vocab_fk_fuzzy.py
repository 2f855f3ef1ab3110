"""Vocabulary build, FK coverage audit, blocked fuzzy matching."""

from pyspark.sql import functions as F


def test_build_vocab_rank_and_caps(spark):
    from feat_spark.operators.encoding import build_vocab

    df = spark.createDataFrame(
        [("b b b a a c   d",), ("a d",), ("",)], "text string"
    )
    out = {r["word"]: r for r in build_vocab(df, "text").collect()}
    # counts: a=3, b=3, c=1, d=2; empty text contributes nothing
    assert out["a"]["n_occurrences"] == 3 and out["b"]["n_occurrences"] == 3
    # tie a/b breaks lexicographically; then d, then c
    assert out["a"]["token_id"] == 0
    assert out["b"]["token_id"] == 1
    assert out["d"]["token_id"] == 2
    assert out["c"]["token_id"] == 3
    # min_count prunes BEFORE ranking; max_size caps AFTER
    pruned = build_vocab(df, "text", min_count=2)
    assert {r["word"] for r in pruned.collect()} == {"a", "b", "d"}
    capped = build_vocab(df, "text", max_size=2)
    assert {r["word"] for r in capped.collect()} == {"a", "b"}


def test_fk_coverage_orphans_and_nulls(spark):
    from feat_spark.plans.audit import fk_coverage

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 99), (5, None)],
        "id long, fk long",
    )
    parent = spark.createDataFrame([(10,), (20,), (30,)], "pk long")
    r = fk_coverage(child, "fk", parent, "pk", "child->parent").collect()[0]
    assert r["relation"] == "child->parent"
    assert r["n_rows"] == 5
    assert r["n_null_keys"] == 1
    assert r["n_orphans"] == 1          # fk=99
    assert r["coverage"] == 0.75        # 3 of 4 non-null keys match
    # all-null child keys: coverage NULL, zero orphans
    nulls = spark.createDataFrame([(1, None), (2, None)], "id long, fk long")
    r2 = fk_coverage(nulls, "fk", parent, "pk", "x").collect()[0]
    assert r2["n_orphans"] == 0 and r2["coverage"] is None


def test_fuzzy_pairs_blocked_levenshtein(spark):
    from feat_spark.operators.dedup import fuzzy_pairs

    df = spark.createDataFrame(
        [
            (1, "red widget"),
            (2, "red widgets"),     # dist 1 to id 1
            (3, "red sprocket"),    # far from id 1 -> excluded at max 2
            (4, "blue widget"),     # different block, never compared
            (5, "red widget"),      # exact dup of id 1
        ],
        "id long, name string",
    )
    out = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_pairs(df, "id", "name", max_dist=2).collect()
    }
    assert out[(1, 2)] == 1
    assert out[(1, 5)] == 0
    assert out[(2, 5)] == 1
    assert (1, 3) not in out and (1, 4) not in out
    # raising the cutoff admits the far pair (widget -> sprocket)
    wide = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_pairs(df, "id", "name", max_dist=10).collect()
    }
    assert (1, 3) in wide and wide[(1, 3)] > 2
    # custom block column: constant block compares across colors
    allb = fuzzy_pairs(
        df, "id", "name", max_dist=4, block=F.lit("x")
    ).collect()
    assert (4, 5) in {(r["id_a"], r["id_b"]) for r in allb}  # blue~red widget dist 4


def test_vocab_coverage_oov(spark):
    from feat_spark.operators.encoding import build_vocab, vocab_coverage

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a zz"), (3, "")],
        "doc_id long, text string",
    )
    vocab = build_vocab(docs, "text", min_count=2)  # only "a" survives
    out = {
        r["doc_id"]: r for r in vocab_coverage(docs, vocab).collect()
    }
    assert out[1]["n_tokens"] == 3 and out[1]["n_oov"] == 1  # "b"
    assert out[1]["oov_rate"] == round(1 / 3, 6)
    assert out[2]["n_tokens"] == 2 and out[2]["n_oov"] == 1  # "zz"
    # empty doc keeps its row: 0 tokens, NULL rate (not 0% OOV)
    assert out[3]["n_tokens"] == 0 and out[3]["oov_rate"] is None
