"""Deterministic PageRank (operators/graph.py)."""

import numpy as np


def _numpy_pagerank(edges, iters=3, damping=0.85):
    """Driver-side reference with the operator's exact discipline:
    decimal-quantized contributions approximated by rounding, ranks
    rounded to 12dp each iteration."""
    und = set()
    for a, b in edges:
        und.add((a, b))
        und.add((b, a))
    nodes = sorted({x for e in und for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for a, _ in und:
        deg[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        s = np.zeros(n)
        for a, b in und:
            s[idx[b]] += round(r[idx[a]] / deg[idx[a]], 12)
        r = np.round((1.0 - damping) / n + damping * s, 12)
    return dict(zip(nodes, r))


def test_pagerank_star_graph(spark):
    from feat_spark.operators.graph import pagerank

    edges = [("a", "b"), ("a", "c"), ("a", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r["node"]: r["pagerank"] for r in pagerank(df, iters=3).collect()}
    assert set(out) == {"a", "b", "c", "d"}
    # hub dominates; leaves are symmetric
    assert out["a"] > out["b"]
    assert out["b"] == out["c"] == out["d"]
    # total mass conserved (undirected, no dangling): sums to ~1
    assert abs(sum(out.values()) - 1.0) < 1e-9

    ref = _numpy_pagerank(edges)
    for k in out:
        assert abs(out[k] - ref[k]) < 1e-9, k


def test_pagerank_layout_independent_and_duplicate_safe(spark):
    from feat_spark.operators.graph import pagerank

    # duplicate edges and both directions present: distinct() inside
    # must collapse them, so the result equals the clean edge list's
    edges = [("a", "b"), ("a", "b"), ("b", "a"), ("b", "c")]
    clean = [("a", "b"), ("b", "c")]
    d1 = spark.createDataFrame(edges, "src string, dst string").repartition(7)
    d2 = spark.createDataFrame(clean, "src string, dst string")
    r1 = {r["node"]: r["pagerank"] for r in pagerank(d1, iters=3).collect()}
    r2 = {r["node"]: r["pagerank"] for r in pagerank(d2, iters=3).collect()}
    assert r1 == r2
    assert r1["b"] > r1["a"]  # middle node of the path ranks highest


def test_pagerank_mass_conserved_on_random_graphs(spark):
    """Undirected + no dangling nodes => total rank mass stays 1 for
    any graph; checked on three seeded random graphs."""
    import random

    from feat_spark.operators.graph import pagerank

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        nodes = [f"n{i}" for i in range(30)]
        edges = list(
            {
                (rng.choice(nodes), rng.choice(nodes))
                for _ in range(60)
            }
        )
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "src string, dst string")
        out = pagerank(df, iters=3).collect()
        total = sum(r["pagerank"] for r in out)
        assert abs(total - 1.0) < 1e-8, (seed, total)
        assert all(r["pagerank"] > 0 for r in out)


def test_pagerank_directed_includes_sink_nodes(spark):
    """Directed mode: a node appearing only as a destination must get a
    rank row and keep the mass sent to it (review fix)."""
    from feat_spark.operators.graph import pagerank

    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    out = {r["node"]: r["pagerank"] for r in
           pagerank(df, iters=2, undirected=False).collect()}
    assert set(out) == {"a", "b"}
    assert out["b"] > out["a"]  # b receives a's whole contribution


def test_pagerank_reliable_checkpoint_matches_local(spark, tmp_path):
    """reliable_checkpoint_dir= (the cluster-scale lineage-truncation
    option) is numerically identical to the default localCheckpoint —
    the decimal-sum + 12dp-round discipline makes materialization
    strategy irrelevant to the result."""
    from feat_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")],
        "src string, dst string",
    )
    base = {(r.node, r.pagerank) for r in pagerank(edges, iters=3).collect()}
    rel = {
        (r.node, r.pagerank)
        for r in pagerank(
            edges, iters=3, reliable_checkpoint_dir=str(tmp_path / "ckpt")
        ).collect()
    }
    assert base == rel
