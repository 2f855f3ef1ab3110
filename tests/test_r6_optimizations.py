"""Round-6 optimization parity tests.

Every r6 plan change claims BIT-IDENTICAL results; these tests pin
each optimized path against its unoptimized twin (or a brute-force
reference) on data small enough to enumerate, so a later edit cannot
silently de-synchronize them.
"""

import itertools
import math

import pytest
from pyspark.sql import functions as F


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


@pytest.fixture(scope="module")
def name_df(spark):
    rows = [
        (1, "alpha beta gamma"),
        (2, "alpha beta gamba"),  # dist 1 from 1
        (3, "alpha bexa gamma"),  # dist 1 from 1
        (4, "alpha beta"),        # shorter, same block
        (5, "alpha betq gamma"),  # dist 1 from 1, 2 from 2/3
        (6, "delta beta gamma"),  # different block
        (7, "alpha zeta other"),  # same first token, diff 2nd char
        (8, "alpha beta gamma"),  # exact dup of 1
    ]
    return spark.createDataFrame(rows, ["id", "name"])


def test_fuzzy_pairs_broadcast_matches_shuffle(spark, name_df):
    from feat_spark.operators.dedup import fuzzy_pairs

    toks = F.split(F.col("name"), " ")
    blk = F.concat_ws(":", toks[0], F.substring(toks[1], 1, 1))
    base = sorted(
        tuple(r)
        for r in fuzzy_pairs(
            name_df, "id", "name", max_dist=2, block=blk
        ).collect()
    )
    bcast = sorted(
        tuple(r)
        for r in fuzzy_pairs(
            name_df, "id", "name", max_dist=2, block=blk, broadcast=True
        ).collect()
    )
    assert base == bcast
    # brute-force reference within blocks
    rows = [(r["id"], r["name"]) for r in name_df.collect()]
    blkof = lambda s: s.split(" ")[0] + ":" + s.split(" ")[1][0]
    want = sorted(
        (a_id, b_id, _levenshtein(a_s, b_s))
        for (a_id, a_s), (b_id, b_s) in itertools.combinations(rows, 2)
        if blkof(a_s) == blkof(b_s) and _levenshtein(a_s, b_s) <= 2
    )
    assert base == want


def test_fuzzy_charset_prefilter_is_lossless_on_random_edits(spark):
    # random word-soup strings with planted <=2-edit variants: the
    # popcount prefilter must never drop a true pair
    import random

    rnd = random.Random(7)
    vocab = ["lorem", "ipsum", "dolor", "sit", "amet", "elit", "sed"]
    rows = []
    for i in range(40):
        s = " ".join(rnd.choice(vocab) for _ in range(4))
        rows.append((2 * i, s))
        t = list(s)
        for _ in range(rnd.randint(1, 2)):  # 1-2 random substitutions
            p = rnd.randrange(len(t))
            t[p] = rnd.choice("abcdefghijklmnopqrstuvwxyz")
        rows.append((2 * i + 1, "".join(t)))
    df = spark.createDataFrame(rows, ["id", "name"])
    from feat_spark.operators.dedup import fuzzy_pairs

    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_pairs(
            df, "id", "name", max_dist=2, block=F.lit("x"), broadcast=True
        ).collect()
    }
    want = {
        (a_id, b_id): _levenshtein(a_s, b_s)
        for (a_id, a_s), (b_id, b_s) in itertools.combinations(rows, 2)
        if _levenshtein(a_s, b_s) <= 2
    }
    assert got == want


def test_containment_counting_prefix_matches_bruteforce(spark):
    # vocabulary deliberately TINY so shingles collide heavily — the
    # regime the counting filter exists for
    import random

    rnd = random.Random(3)
    vocab = ["a", "b", "c", "d", "e"]
    rows = []
    for i in range(60):
        n = rnd.randint(4, 12)
        rows.append((i, " ".join(rnd.choice(vocab) for _ in range(n))))
    # planted containments: truncated copies
    for i in range(60, 80):
        base = rows[i - 60][1]
        w = base.split(" ")
        rows.append((i, " ".join(w[: max(len(w) - 2, 1)])))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    from feat_spark.operators.dedup import containment_pairs

    for t in (0.9, 0.6, 0.0):
        got = sorted(
            (r["id_a"], r["id_b"], r["containment"])
            for r in containment_pairs(
                df, id_col="doc_id", text_col="text", n=3, threshold=t
            ).collect()
        )

        def shingles(s):
            w = s.split(" ")
            if len(w) < 3:
                return set()
            return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

        sh = {i: shingles(s) for i, s in rows}
        want = sorted(
            (ia, ib, round(len(sh[ia] & sh[ib]) / len(sh[ia]), 6))
            for ia, ib in itertools.permutations(sh, 2)
            if sh[ia] and sh[ib] and sh[ia] & sh[ib]
            and round(len(sh[ia] & sh[ib]) / len(sh[ia]), 6) >= t
        )
        assert got == want, f"threshold {t}"


def test_semantic_dedup_grouped_bitwise_matches_join(spark):
    import random

    rnd = random.Random(11)
    rows = []
    for i in range(300):
        rows.append((i, [rnd.uniform(-1, 1) for _ in range(8)]))
    # planted near-dups (identical vectors -> cos == 1.0 exactly)
    for i in range(300, 320):
        rows.append((i, list(rows[i - 300][1])))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    from feat_spark.operators.similarity import semantic_dedup

    # threshold at a mid value so boundary pairs exist in both regimes
    a = sorted(
        tuple(r)
        for r in semantic_dedup(
            df, threshold=0.8, n_centroids=4, id_col="vec_id",
            vec_col="embedding",
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in semantic_dedup(
            df, threshold=0.8, n_centroids=4, id_col="vec_id",
            vec_col="embedding", pair_strategy="grouped",
        ).collect()
    )
    assert a == b
    assert any(r[2] for r in b)  # planted dups actually flagged


def test_cross_correlation_explode_matches_reference(spark):
    # tiny regular series; reference = plain python pearson per shift
    rows = []
    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    buys = [1, 0, 2, 1, 0, 3, 1, 2, 0, 1]
    for grp in (0, 1):
        for t, (x, y) in enumerate(zip(vals, buys)):
            rows.append((grp, t, x + grp, y))
    df = spark.createDataFrame(rows, ["g", "t", "x", "y"])
    from feat_spark.operators.encoding import cross_correlation

    got = {
        (r["g"], r["shift"]): (r["n_pairs"], r["xcorr"])
        for r in cross_correlation(
            df, group_col="g", order_col="t", x_col="x", y_col="y",
            shifts=(-1, 0, 1),
        ).collect()
    }

    def pearson(xs, ys):
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        syy = sum(b * b for b in ys)
        covn = n * sxy - sx * sy
        vxn = n * sxx - sx * sx
        vyn = n * syy - sy * sy
        if n < 2 or vxn <= 0 or vyn <= 0:
            return None
        return round(covn / (math.sqrt(vxn) * math.sqrt(vyn)), 6)

    for grp in (0, 1):
        xs = [x + grp for x in vals]
        for s in (-1, 0, 1):
            if s >= 0:
                pairs = [(xs[i], buys[i + s]) for i in range(len(xs) - s)]
            else:
                pairs = [(xs[i], buys[i + s]) for i in range(-s, len(xs))]
            px = [p[0] for p in pairs]
            py = [p[1] for p in pairs]
            n, xc = got[(grp, s)]
            assert n == len(pairs)
            assert xc == pytest.approx(pearson(px, py), abs=1e-9) or (
                xc is None and pearson(px, py) is None
            )


def test_orders_rhs_agg_matches_window(spark):
    # max(struct) dedup must pick the max-orderkey row per group
    rows = [
        (10, "2024-01-01", 100, 5.0),
        (10, "2024-01-01", 101, 7.0),
        (10, "2024-01-02", 102, 9.0),
        (20, "2024-01-01", 103, 1.0),
    ]
    o = spark.createDataFrame(
        rows, ["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"]
    )
    got = sorted(
        tuple(r)
        for r in o.groupBy("o_custkey", "o_orderdate")
        .agg(F.max(F.struct("o_orderkey", "o_totalprice")).alias("__top"))
        .select(
            "o_custkey",
            "o_orderdate",
            F.col("__top.o_orderkey"),
            F.col("__top.o_totalprice"),
        )
        .collect()
    )
    assert got == [
        (10, "2024-01-01", 101, 7.0),
        (10, "2024-01-02", 102, 9.0),
        (20, "2024-01-01", 103, 1.0),
    ]
