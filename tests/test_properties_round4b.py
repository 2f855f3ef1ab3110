"""Property-based invariants of the late-round-4 sketch / analytics
primitives — Spark-backed, so examples are deliberately few (each case
is a real job); the properties are the operators' defining contracts:

  * Count-Min NEVER undercounts, and split-built grids merged by
    addition equal the one-shot grid wherever the cut lands
  * the HDR sketch's percentile estimate brackets the true
    percentile_disc value within one sub-bucket (est <= true <
    est * 17/16) for any positive stream
  * reset_cumsum with no resets IS the plain cumulative sum
  * pareto_frontier equals the brute-force dominance scan
  * peak_concurrency equals the brute-force instant-by-instant max
  * rand_index is invariant under renaming cluster labels, and 1.0
    for identical clusterings
  * rbo_rankings is symmetric and lives in [0, 1]
  * gains_table's cumulative capture is monotone and terminal
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    stream=st.lists(st.integers(0, 12), min_size=1, max_size=60),
)
@settings(**_SETTINGS)
def test_cms_never_undercounts_and_merges(spark, stream):
    from pyspark.sql import functions as F

    from feat_spark.operators.cms import countmin_build, countmin_topk

    df = spark.createDataFrame([(str(k),) for k in stream], "k string")
    exact = {}
    for k in stream:
        exact[str(k)] = exact.get(str(k), 0) + 1
    out = {
        r["key"]: r
        for r in countmin_topk(df, "k", k=20, depth=3, width=8).collect()
    }
    for k, r in out.items():
        assert r["exact_n"] == exact[k]
        assert r["cms_est"] >= exact[k]
    # split anywhere: merged grids == one-shot grid
    cut = len(stream) // 2
    halves = [h for h in (stream[:cut], stream[cut:]) if h]
    grids = [
        countmin_build(
            spark.createDataFrame([(str(k),) for k in h], "k string"),
            "k", depth=3, width=8,
        )
        for h in halves
    ]
    merged = grids[0]
    for g in grids[1:]:
        merged = merged.unionAll(g)
    merged = merged.groupBy("seed", "bucket").agg(F.sum("n").alias("n"))
    whole = countmin_build(df, "k", depth=3, width=8)
    got = {(r["seed"], r["bucket"]): r["n"] for r in merged.collect()}
    want = {(r["seed"], r["bucket"]): r["n"] for r in whole.collect()}
    assert got == want


@given(
    vals=st.lists(st.integers(1, 100_000), min_size=1, max_size=80),
)
@settings(**_SETTINGS)
def test_hdr_estimate_brackets_truth(spark, vals):
    from feat_spark.operators.qsketch import hdr_percentiles

    df = spark.createDataFrame([(v,) for v in vals], "v long")
    s = sorted(vals)
    for r in hdr_percentiles(df, "v", (250, 500, 750, 990)).collect():
        true = s[r["target_rank"] - 1]
        assert r["est"] <= true < r["est"] * (17 / 16) + 1e-9


@given(
    deltas=st.lists(st.integers(-50, 50), min_size=1, max_size=40),
)
@settings(**_SETTINGS)
def test_reset_cumsum_without_resets_is_cumsum(spark, deltas):
    from feat_spark.operators.rolling import reset_cumsum

    rows = [("k", i, i, d, False) for i, d in enumerate(deltas)]
    df = spark.createDataFrame(rows, ["k", "t", "i", "d", "r"])
    out = {
        r["i"]: r["balance"]
        for r in reset_cumsum(df, "k", "t", "i", "d", "r").collect()
    }
    run = 0
    for i, d in enumerate(deltas):
        run += d
        assert out[i] == run


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)),
        min_size=1,
        max_size=25,
        unique=True,
    ),
)
@settings(**_SETTINGS)
def test_pareto_frontier_equals_bruteforce(spark, pts):
    from feat_spark.operators.profile import pareto_frontier

    rows = [("g", i, x, float(y)) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, ["g", "id", "x", "y"])
    got = {r["id"] for r in pareto_frontier(df, ("g",), "x", "y", "id").collect()}
    # brute force: keep i unless some j strictly dominates OR ties and
    # has a smaller id (the one-representative rule)
    keep = set()
    for i, (xi, yi) in enumerate(pts):
        dominated = any(
            (xj >= xi and yj >= yi and (xj > xi or yj > yi))
            or (xj == xi and yj == yi and j < i)
            for j, (xj, yj) in enumerate(pts)
            if j != i
        )
        if not dominated:
            keep.add(i)
    assert got == keep


@given(
    iv=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).map(
            lambda p: (min(p), max(p))
        ),
        min_size=1,
        max_size=25,
    ),
)
@settings(**_SETTINGS)
def test_peak_concurrency_equals_bruteforce(spark, iv):
    from feat_spark.operators.eventops import peak_concurrency

    df = spark.createDataFrame([("g", s, e) for s, e in iv], ["g", "s", "e"])
    got = peak_concurrency(df, "s", "e", group_cols=("g",)).collect()[0]
    want = max(
        sum(1 for s, e in iv if s <= t <= e) for t in range(0, 31)
    )
    assert got["peak_concurrency"] == want
    assert got["n_intervals"] == len(iv)


@given(
    labels=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 3)),
        min_size=2,
        max_size=40,
    ),
    perm=st.permutations(list(range(4))),
)
@settings(**_SETTINGS)
def test_rand_index_label_renaming_invariant(spark, labels, perm):
    from feat_spark.operators.experiment import rand_index

    df = spark.createDataFrame(labels, ["p", "t"])
    renamed = spark.createDataFrame(
        [(perm[p], t) for p, t in labels], ["p", "t"]
    )
    a = rand_index(df, "p", "t").collect()[0]
    b = rand_index(renamed, "p", "t").collect()[0]
    assert a["ri"] == b["ri"] and a["ari"] == b["ari"]
    ident = rand_index(
        spark.createDataFrame([(t, t) for _, t in labels], ["p", "t"]),
        "p", "t",
    ).collect()[0]
    assert ident["ri"] == 1.0


@given(order=st.permutations(list(range(1, 6))))
@settings(**_SETTINGS)
def test_rbo_symmetric_and_bounded(spark, order):
    from feat_spark.operators.keywords import rbo_rankings

    a = spark.createDataFrame(
        [("q", f"i{r}", r) for r in range(1, 6)], ["query_id", "item", "rank"]
    )
    b = spark.createDataFrame(
        [("q", f"i{v}", r + 1) for r, v in enumerate(order)],
        ["query_id", "item", "rank"],
    )
    ab = rbo_rankings(a, b).collect()[0]["rbo"]
    ba = rbo_rankings(b, a).collect()[0]["rbo"]
    assert ab == ba
    assert 0.0 <= ab <= 1.0


@given(
    ys=st.lists(st.integers(0, 1), min_size=4, max_size=40),
)
@settings(**_SETTINGS)
def test_gains_capture_monotone_terminal(spark, ys):
    from feat_spark.operators.experiment import gains_table

    rows = [("s", i, (i * 7) % 13, y) for i, y in enumerate(ys)]
    df = spark.createDataFrame(rows, ["seg", "id", "score", "y"])
    out = sorted(
        gains_table(df, "seg", "score", "y", tiebreak_col="id", n_bins=4).collect(),
        key=lambda r: r["bin"],
    )
    caps = [r["capture"] for r in out]
    if sum(ys) == 0:
        assert all(c is None for c in caps)
    else:
        assert all(x <= y + 1e-12 for x, y in zip(caps, caps[1:]))
        assert abs(caps[-1] - 1.0) < 1e-12
    assert sum(r["n"] for r in out) == len(ys)
