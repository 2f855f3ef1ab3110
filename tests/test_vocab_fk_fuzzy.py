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


def test_fuzzy_pairs_or_blocks_recall(spark):
    """blocks=[b1, b2] is the OR-construction: a typo in the second
    token's first character escapes b1 = (token1, first char of
    token2) but is caught by b2 = (token1, length) — union recall, the
    multi-table LSH device. Pairs found by several blocks appear once
    and pay Levenshtein once."""
    import pytest as _pytest

    from feat_spark.operators.dedup import fuzzy_pairs

    df = spark.createDataFrame(
        [
            (1, "alpha beta"),
            (2, "alpha ceta"),       # dist 1 via 2nd-token 1st char
            (3, "gamma delta"),
            (4, "gamma felta"),      # same planted shape
            (5, "alpha beta xyzzy"), # same b1 as 1, length separates
        ],
        "id long, name string",
    )
    toks = F.split(F.col("name"), " ")
    b1 = F.concat_ws(":", toks[0], F.substring(toks[1], 1, 1))
    b2 = F.concat_ws(":", toks[0], F.length("name").cast("string"))

    single = {
        (r.id_a, r.id_b): r.dist
        for r in fuzzy_pairs(df, "id", "name", max_dist=2, block=b1).collect()
    }
    multi = {
        (r.id_a, r.id_b): r.dist
        for r in fuzzy_pairs(df, "id", "name", max_dist=2, blocks=[b1, b2]).collect()
    }
    # single-block recall floor on the planted typos: 0 of 2
    assert (1, 2) not in single and (3, 4) not in single
    # OR-construction recovers both planted pairs at the exact distance
    assert multi[(1, 2)] == 1 and multi[(3, 4)] == 1
    # and never loses what a single block found
    assert set(single) <= set(multi)
    # the pair-level dedup keeps exactly one row per id pair
    rows = fuzzy_pairs(df, "id", "name", max_dist=2, blocks=[b1, b2]).collect()
    assert len(rows) == len({(r.id_a, r.id_b) for r in rows})
    with _pytest.raises(ValueError):
        fuzzy_pairs(df, "id", "name", max_dist=2, block=b1, blocks=[b1, b2])
