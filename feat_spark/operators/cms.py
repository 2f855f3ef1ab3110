"""Count-Min sketch — mergeable frequency estimation in O(d*w) space.

The 100 TB problem: "how often does each of these keys occur?" over a
stream too large to hold exact per-key counts for the full key domain
(URLs, user ids, n-grams). The Count-Min sketch (Cormode & Muthukrishnan
2005) answers point queries with ``est >= exact`` and
``est <= exact + eps*N`` (w = ceil(e/eps), failure prob e^-d) from a
fixed d x w counter grid that MERGES BY ADDITION — the same algebraic
property that makes :func:`feat_spark.plans.incremental.incremental_rollup`
and the HLL rollup incremental: per-day sketches sum into monthly ones
without rescanning.

Spark-first shape:

* grain-reduce first — ``groupBy(key).count()`` so the sketch build
  explodes d rows per DISTINCT key, not per occurrence (the partial agg
  has already combined map-side);
* the grid is a RELATION ``(seed, bucket, n)`` of at most d*w rows built
  by one partial-aggregated sum — mergeable, storable, unionable;
* probes broadcast-join the (tiny) grid and take ``min`` over the d
  rows per key.

Determinism/portability device: buckets come from the repo's portable
md5 hash (``('0x' || substr(md5(seed || '#' || key),1,8))::BIGINT % w``
in DuckDB), so an oracle replays the ENTIRE sketch bit-for-bit — the
gate asserts the estimates themselves, not just their bounds.

Lives OUTSIDE the flagship benchmark closure on purpose (see
``operators/eventops.py`` for the rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(key: F.Column, seed: int, width: int) -> F.Column:
    """Portable md5 bucket for one hash row of the grid."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}#"), key)), 1, 8), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(width))


def countmin_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Build the Count-Min grid ``(seed, bucket, n)`` for the stream of
    ``key_col`` values (NULLs excluded — a NULL key has no identity to
    count). At most ``depth * width`` rows regardless of input size;
    two grids over disjoint inputs merge by ``groupBy(seed, bucket)
    .sum(n)`` — the incremental path.

    Plan: one exact grain-reduction agg (partial/map-side combined),
    then a d-way explode of DISTINCT keys only, then a second partial
    agg onto the fixed grid. No shuffle carries per-occurrence rows.
    """
    counts = (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).cast("string").alias("__k"))
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    rows = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        _bucket(F.col("__k"), s, width).alias("bucket"),
                    )
                    for s in range(depth)
                ]
            )
        ).alias("p"),
        "__n",
    )
    return rows.groupBy(F.col("p.seed").alias("seed"), F.col("p.bucket").alias("bucket")).agg(
        F.sum("__n").alias("n")
    )


def countmin_topk(
    df: DataFrame,
    key_col: str,
    k: int = 20,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Heavy hitters with their Count-Min estimates: the exact top-k
    keys of ``key_col`` (by count desc, key asc — deterministic), each
    carrying ``exact_n`` and the sketch's ``cms_est`` point query.

    ``cms_est >= exact_n`` always (counters only ever over-count);
    equality whenever none of the key's d buckets collide. Probing is
    a broadcast join of k*d probe rows against the <= d*w-row grid —
    driver never sees the stream, only the k winners (TakeOrdered).

    Output: ``(key, exact_n, cms_est)``.
    """
    sketch = countmin_build(df, key_col, depth=depth, width=width)
    top = (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).cast("string").alias("key"))
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("key").asc())
        .limit(k)
    )
    probes = top.select(
        "key",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        _bucket(F.col("key"), s, width).alias("bucket"),
                    )
                    for s in range(depth)
                ]
            )
        ).alias("p"),
    ).select("key", "exact_n", "p.seed", "p.bucket")
    hit = probes.join(F.broadcast(sketch), ["seed", "bucket"], "inner")
    return hit.groupBy("key", "exact_n").agg(
        F.min("n").alias("cms_est")
    )


def countmin_join_size(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Equi-join SIZE estimation from two Count-Min grids — the
    classic AGMS/CM inner-product estimator: ``|A ⋈ B|`` ≈
    ``min over seeds of Σ_bucket gridA[n]·gridB[n]``. The
    cardinality-estimation primitive behind join planning and the
    ``join_cardinality_audit``'s exact report, at sketch cost: each
    side reduces to a d×w grid (buildable incrementally, mergeable by
    addition — per-partition sketches union BEFORE estimating), and
    the estimate is a d·w-row join of two tiny relations. One-sided
    like the point query: collisions only ADD mass, so
    ``estimate >= exact`` always, with the usual ε·|A|·|B| slack.

    The exact join size rides along for the audit
    (``Σ n_a·n_b over shared keys`` — key-grain, never materializing
    join rows). Portable md5 buckets: the oracle replays BOTH grids
    and the inner products bit-for-bit.

    Output: one row ``(exact_join_rows, cms_estimate)``.
    """
    ga = countmin_build(left, left_key, depth=depth, width=width)
    gb = countmin_build(right, right_key, depth=depth, width=width)
    ip = (
        ga.join(
            gb.select(
                "seed", "bucket", F.col("n").alias("__nb")
            ),
            ["seed", "bucket"],
        )
        .groupBy("seed")
        .agg(F.sum(F.col("n") * F.col("__nb")).alias("__ip"))
    )
    # a seed with NO overlapping buckets has inner product ZERO — the
    # min must see it (reindex over the seed spine, absent -> 0)
    est = (
        ga.select("seed")
        .distinct()
        .join(ip, "seed", "left")
        .agg(F.min(F.coalesce(F.col("__ip"), F.lit(0))).alias("cms_estimate"))
    )
    ca = (
        left.filter(F.col(left_key).isNotNull())
        .groupBy(F.col(left_key).cast("string").alias("__k"))
        .agg(F.count(F.lit(1)).alias("__na"))
    )
    cb = (
        right.filter(F.col(right_key).isNotNull())
        .groupBy(F.col(right_key).cast("string").alias("__k"))
        .agg(F.count(F.lit(1)).alias("__nb"))
    )
    exact = ca.join(cb, "__k").agg(
        F.coalesce(F.sum(F.col("__na") * F.col("__nb")), F.lit(0)).alias(
            "exact_join_rows"
        )
    )
    return exact.crossJoin(F.broadcast(est))  # 1-row (cuped class)
