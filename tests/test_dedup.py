"""MinHash/LSH dedup: the degenerate-bucket cap (a boilerplate-heavy
corpus puts thousands of identical docs behind one band hash) and its
parity with the uncapped pipeline on ordinary corpora."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from feat_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    minhash_signatures,
)

_WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def varied(spark):
    rng = np.random.default_rng(11)
    rows = [
        (i, " ".join(rng.choice(_WORDS, size=12)))
        for i in range(100)
    ]
    return _docs(spark, rows)


def test_bucket_cap_bounds_pairs_and_keeps_connectivity(spark):
    """800 identical docs = one degenerate bucket per band. Uncapped
    that is ~320k candidate pairs from one task; capped it must emit
    exactly the 799 star pairs, and the verified output still connects
    every doc to the hub (rep selection unchanged)."""
    n = 800
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, boiler) for i in range(n)] + [
        (n + 1, "one completely unrelated document body here"),
    ]
    df = _docs(spark, rows)
    sigs = minhash_signatures(df)
    cand = lsh_candidate_pairs(sigs, max_bucket=50)
    pairs = cand.collect()
    assert len(pairs) == n - 1  # star, not quadratic
    assert {r["id_a"] for r in pairs} == {0}  # hub = bucket-min id
    assert {r["id_b"] for r in pairs} == set(range(1, n))

    verified = minhash_dedup_pairs(df, max_bucket=50, threshold=0.9).collect()
    assert len(verified) == n - 1
    assert all(r["jaccard"] == 1.0 for r in verified)


def test_cap_parity_on_ordinary_corpus(spark, varied):
    """With no degenerate buckets, a generous cap changes nothing:
    capped == uncapped bit-for-bit."""
    plain = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_dedup_pairs(varied, threshold=0.3).collect()
    }
    capped = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_dedup_pairs(varied, threshold=0.3, max_bucket=64).collect()
    }
    assert plain == capped


def test_connected_components(spark):
    """HashMin label propagation: chain (multi-round propagation),
    triangle, isolated pair — component = min reachable id."""
    from feat_spark.operators.dedup import connected_components

    chain = [(i, i + 1) for i in range(30, 40)]  # 30..40: diameter 10
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11)] + chain, "id_a long, id_b long"
    )
    got = {r["doc_id"]: r["component"] for r in connected_components(pairs).collect()}
    assert {v for k, v in got.items() if k in (1, 2, 3)} == {1}
    assert got[10] == got[11] == 10
    assert {got[i] for i in range(30, 41)} == {30}


def test_connected_components_star_bit_equal(spark):
    """The small-star/large-star contraction must return EXACTLY the
    HashMin labels (same vertices, same component mins) on a mixed
    graph: triangle, chain, isolated pair."""
    from feat_spark.operators.dedup import connected_components

    chain = [(i, i + 1) for i in range(30, 40)]
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11)] + chain, "id_a long, id_b long"
    )
    hashmin = {
        (r["doc_id"], r["component"])
        for r in connected_components(pairs, algorithm="hashmin").collect()
    }
    star = {
        (r["doc_id"], r["component"])
        for r in connected_components(pairs, algorithm="star").collect()
    }
    assert star == hashmin


def test_star_contraction_log_rounds_on_path(spark):
    """On a 32-node path (diameter 31) HashMin needs 31 propagation
    rounds; the star contraction must converge in O(log n) — the reason
    it exists for 10^12-doc graphs that aren't star-like."""
    from feat_spark.operators.dedup import connected_components

    n = 32
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    st = {}
    star = {
        (r["doc_id"], r["component"])
        for r in connected_components(pairs, algorithm="star", stats=st).collect()
    }
    assert star == {(i, 0) for i in range(n)}
    assert st["converged"]
    assert st["rounds"] <= 8, f"star took {st['rounds']} rounds on a {n}-path"


def test_hashmin_nonconvergence_warns(spark):
    """Partial labels are wrong labels: HashMin must warn (not silently
    return) when the fixpoint isn't reached within max_iters."""
    import warnings

    from feat_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(15)], "id_a long, id_b long"
    )
    st = {}
    with pytest.warns(RuntimeWarning, match="did NOT converge"):
        labels = connected_components(
            pairs, max_iters=3, stats=st
        ).collect()
    assert not st["converged"]
    # and the partial labels really are partial — the far end of the
    # chain has not yet heard about vertex 0
    got = {r["doc_id"]: r["component"] for r in labels}
    assert got[15] != 0

    # converged runs must NOT warn
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        connected_components(pairs, max_iters=20, stats=st).collect()
    assert st["converged"]


def test_curation_respects_custom_id_col(spark):
    """curate_documents(df, id_col=...) on a frame whose id column is
    NOT named doc_id — the round-2 verdict flagged the hard-coded
    component join as an API landmine."""
    from feat_spark.plans.curation import curate_documents

    rows = [
        (101, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
        (102, "alpha bravo charlie delta echo foxtrot golf hotel india kilo"),
        (103, "completely different words that share nothing with the others xyz"),
    ]
    df = spark.createDataFrame(rows, "id long, body string")
    out = curate_documents(
        df, id_col="id", text_col="body", quality_floor=0.0,
        near_dup_threshold=0.5, minhash_k=16, bands=8, shingle_n=3,
        sample_pct=100,
    )
    kept = {r["id"] for r in out.collect()}
    # 101/102 are near-dups -> min id 101 survives; 103 untouched
    assert kept == {101, 103}


def test_capped_pipeline_components_cover_bucket(spark):
    """Bucket-cap star pairs + CC: every one of the 800 identical docs
    lands in the hub's component — cap changes pair count, not groups."""
    from feat_spark.operators.dedup import connected_components

    n = 800
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    df = _docs(spark, [(i, boiler) for i in range(n)])
    pairs = minhash_dedup_pairs(df, max_bucket=50, threshold=0.9)
    comp = {r["doc_id"]: r["component"] for r in connected_components(pairs).collect()}
    assert len(comp) == n
    assert set(comp.values()) == {0}


def test_curation_dropped_doc_cannot_bridge_clusters(spark):
    """plans/curation.py composition rule: near-dup pairs are computed
    on the POST-quality-filter corpus, so a dropped low-quality doc
    must not act as the bridge that merges two clusters (which would
    wrongly drop one of the two good docs)."""
    from feat_spark.plans.curation import curate_documents

    a_words = [f"alpha{i}" for i in range(20)]
    b_words = [f"beta{i}" for i in range(20)]
    junk = ["!!!!!!!!!!"] * 30  # pure punctuation: kills C's quality
    rows = [
        (1, " ".join(a_words)),
        (2, " ".join(b_words)),
        # C contains ALL of A's and B's text -> near-dup of both, but
        # its punctuation density puts it below the quality floor
        (3, " ".join(a_words + b_words + junk)),
    ]
    df = _docs(spark, rows)
    out = curate_documents(
        df, quality_floor=0.3, near_dup_threshold=0.15,
        minhash_k=16, bands=8, shingle_n=3, sample_pct=100,
    )
    kept = {r["doc_id"] for r in out.collect()}
    assert kept == {1, 2}  # C dropped by quality; A and B BOTH survive

    # control: with the floor relaxed, C bridges A and B into one
    # component and only the min-id representative survives
    out2 = curate_documents(
        df, quality_floor=0.0, near_dup_threshold=0.15,
        minhash_k=16, bands=8, shingle_n=3, sample_pct=100,
    )
    assert {r["doc_id"] for r in out2.collect()} == {1}


def test_components_with_singletons_covers_corpus(spark):
    """components_with_singletons: every corpus doc gets a row; docs
    without a dup pair label themselves."""
    from feat_spark.operators.dedup import (
        components_with_singletons,
        connected_components,
    )

    corpus = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(0, 1), (1, 2), (5, 6)], "id_a long, id_b long")
    labels = connected_components(pairs)
    full = {
        r["doc_id"]: r["component"]
        for r in components_with_singletons(labels, corpus).collect()
    }
    assert full == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 5, 6: 5, 7: 7}


def test_star_contraction_random_graphs_property(spark):
    """Property check: on random graphs (mixed components, cycles,
    chains), star-contraction labels match a plain union-find computed
    driver-side."""
    from feat_spark.operators.dedup import connected_components

    rng = np.random.default_rng(23)
    for trial in range(3):
        n = 60
        m = 70
        edges = [
            (int(a), int(b))
            for a, b in rng.integers(0, n, size=(m, 2))
            if a != b
        ]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {
            v: find(v)
            for v in {x for e in edges for x in e}
        }
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r["doc_id"]: r["component"]
            for r in connected_components(pairs, algorithm="star").collect()
        }
        assert got == want, f"trial {trial}"


def test_star_handles_self_pairs_and_single_labels(spark):
    """Review findings r3: a degenerate self-pair's vertex must still
    be labeled (hashmin bit-equality), and even a non-converged early
    exit must emit exactly ONE label row per vertex."""
    from feat_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(7, 7), (1, 2), (2, 3)], "id_a long, id_b long"
    )
    hashmin = {
        (r["doc_id"], r["component"])
        for r in connected_components(pairs, algorithm="hashmin").collect()
    }
    star = {
        (r["doc_id"], r["component"])
        for r in connected_components(pairs, algorithm="star").collect()
    }
    assert star == hashmin
    assert (7, 7) in star

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    with pytest.warns(RuntimeWarning):
        rows = connected_components(
            chain, algorithm="star", max_iters=1
        ).collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))  # one row per vertex, even partial
