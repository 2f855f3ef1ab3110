"""Benchmark decontamination + sequence packing: planted-contamination
semantics and packing-arithmetic invariants (the driver gates
`decontamination` / `pack_sequences` / `packing_stats` are the
oracle-checked twins over real testdata)."""

import pytest
from pyspark.sql import functions as F

from feat_spark.operators.decontam import contamination_flags, decontaminate
from feat_spark.operators.packing import pack_sequences, packing_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def corpus(spark):
    return _docs(spark, [
        # doc 1 contains the benchmark sentence verbatim
        (1, "intro words then the quick brown fox jumps over the lazy dog tail"),
        # doc 2 shares only a 7-gram prefix of it — NOT contaminated at n=8
        (2, "the quick brown fox jumps over the cat instead of the dog"),
        # doc 3 completely unrelated
        (3, "entirely different text about training data pipelines at scale"),
        # doc 4 contains the benchmark sentence twice (distinct grams count once)
        (4, "the quick brown fox jumps over the lazy dog and again "
            "the quick brown fox jumps over the lazy dog"),
    ])


@pytest.fixture(scope="module")
def bench(spark):
    return _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])


def test_contamination_flags_planted(spark, corpus, bench):
    got = {
        r["doc_id"]: (r["n_contaminated_grams"], r["contaminated"])
        for r in contamination_flags(corpus, bench, n=8).collect()
    }
    # bench = 9 words -> two 8-grams; doc 1 contains both, doc 4's
    # repeats dedup to the same two distinct grams
    assert got[1] == (2, True)
    assert got[2] == (0, False)
    assert got[3] == (0, False)
    assert got[4] == (2, True)
    assert len(got) == 4  # one row per corpus doc, clean docs included


def test_decontaminate_drops_only_dirty(spark, corpus, bench):
    kept = {r["doc_id"] for r in decontaminate(corpus, bench, n=8).collect()}
    assert kept == {2, 3}


def test_contamination_ngram_width_matters(spark, corpus, bench):
    """At n=7 doc 2's shared 7-gram becomes a hit — the knob works."""
    got = {
        r["doc_id"]: r["contaminated"]
        for r in contamination_flags(corpus, bench, n=7).collect()
    }
    assert got[2] is True


def test_pack_sequences_invariants(spark):
    """Per shard: offsets are the exclusive prefix sum in doc_id order
    (contiguous stream, no gaps/overlaps), seq arithmetic is consistent,
    spans_boundary flags exactly the docs crossing a ctx boundary."""
    rows = [(i, " ".join(["w"] * (10 + (i * 7) % 60))) for i in range(200)]
    out = pack_sequences(
        _docs(spark, rows), ctx_len=64, n_shards=4
    ).toPandas()
    assert len(out) == 200
    assert set(out["shard"].unique()) <= {0, 1, 2, 3}
    for _, g in out.groupby("shard"):
        g = g.sort_values("doc_id").reset_index(drop=True)
        # contiguous concat stream
        expect = 0
        for _, r in g.iterrows():
            assert r["offset"] == expect
            assert r["seq_index"] == r["offset"] // 64
            assert r["seq_offset"] == r["offset"] % 64
            end_seq = (r["offset"] + max(r["n_tokens"], 1) - 1) // 64
            assert bool(r["spans_boundary"]) == (end_seq > r["seq_index"])
            expect += r["n_tokens"]


def test_pack_sequences_deterministic_and_layout_independent(spark):
    """Same corpus, different input partitioning -> identical packing
    (the shard hash + doc_id order fully determine placement)."""
    rows = [(i, " ".join(["tok"] * (5 + i % 20))) for i in range(100)]
    a = pack_sequences(_docs(spark, rows), ctx_len=32, n_shards=4)
    b = pack_sequences(
        _docs(spark, rows).repartition(13), ctx_len=32, n_shards=4
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_packing_stats_fill(spark):
    rows = [(i, " ".join(["w"] * 10)) for i in range(40)]
    packed = pack_sequences(_docs(spark, rows), ctx_len=64, n_shards=2)
    st = {r["shard"]: r for r in packing_stats(packed, ctx_len=64).collect()}
    for s, r in st.items():
        assert r["total_tokens"] == r["n_docs"] * 10
        assert r["n_seqs"] == -(-r["total_tokens"] // 64)  # ceil
        assert abs(r["fill_ratio"] - r["total_tokens"] / (r["n_seqs"] * 64)) < 1e-6
