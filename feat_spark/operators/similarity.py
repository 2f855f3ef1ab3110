"""Similarity search over embedding columns (``array<float>``).

Two paths:

* ``cosine_topk`` — brute-force exact top-k: broadcast the (small)
  query set against the corpus, dot products via ``zip_with`` +
  ``aggregate`` (pure JVM array math in double precision — matches the
  DuckDB oracle's ``list_cosine_similarity(a::DOUBLE[], b::DOUBLE[])``
  bit-for-bit because both fold left-to-right in double), rank with a
  per-query window. Cost: |Q| x |corpus| rows but ZERO shuffle of the
  corpus (queries are broadcast) — the right baseline, and actually
  the fastest answer whenever |Q| is small.
* ``lsh_bucketed_topk`` — the scale path: random-hyperplane signs
  bucket the corpus once (narrow map, deterministic hash-derived
  hyperplanes — no stored model), queries probe only their bucket.
  Recall < 1 by construction; raise ``planes``' complement (fewer
  planes = bigger buckets = higher recall) or add multi-probe later.

Embedding-cosine near-dup (pairs over one corpus) reuses the same
bucketing idea with a self-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from feat_spark.functions.text import md5_long32


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    ``queries`` = ``(query_id, embedding)`` (small; broadcast).
    Output: ``(query_id, neighbor_id, cos_sim, rank)`` — self-matches
    (same id) excluded. Ties break by neighbor_id ascending so results
    are deterministic across engines.
    """
    # norms hoisted to row grain on both sides: per pair only the dot
    # remains, and dot/(qn*cn) is the identical arithmetic order to
    # cosine(), so every cos_sim bit is unchanged (oracle-safe)
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        _norm(F.col(vec_col)).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        _norm(F.col(vec_col)).alias("__cn"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_sim",
            _dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_sim", 6).alias("cos_sim"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def _hyperplane_sign(vec: Column, plane: int, dim: int) -> Column:
    """Sign of <vec, r_plane> where r_plane's components are
    deterministic md5-derived pseudo-randoms in [-0.5, 0.5) — no model
    to store or broadcast, every executor recomputes the same planes."""
    comps = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            md5_long32(F.concat_ws(":", F.lit(str(plane)), i.cast("string")))
            / F.lit(4294967296.0)
            - F.lit(0.5)
        ),
    )
    dot = F.aggregate(
        F.zip_with(vec, comps, lambda x, r: x.cast("double") * r),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0))


def with_lsh_bucket(
    df: DataFrame,
    vec_col: str,
    planes: int,
    dim: int,
    out_col: str = "bucket",
    plane_offset: int = 0,
) -> DataFrame:
    """Attach the random-hyperplane sign bucket (int in [0, 2^planes)).

    ``plane_offset`` selects an independent plane family (planes
    ``offset .. offset+planes-1`` of the global md5-derived sequence) —
    the device behind OR-construction multi-table LSH."""
    bucket = F.lit(0)
    for p in range(planes):
        bucket = bucket * 2 + _hyperplane_sign(F.col(vec_col), plane_offset + p, dim)
    return df.withColumn(out_col, bucket)


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    planes: int = 4,
    dim: int = 64,
    probe_hamming: int = 0,
    tables: int = 1,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's
    hyperplane bucket. At 100 TB the corpus is bucketed ONCE (written
    bucket-partitioned), so each query touches ~1/2^planes of the data.

    ``probe_hamming`` enables multi-probe: each query also probes every
    bucket within that Hamming distance of its own (sign flips are the
    likeliest LSH misses — a near neighbor lands across one hyperplane).
    Cost multiplies by ~sum(C(planes, i) for i <= h) probed buckets —
    still a tiny corpus fraction — and recall rises sharply.

    ``tables`` enables OR-construction: that many INDEPENDENT hash
    tables (disjoint md5-derived plane families, table t = planes
    ``t*planes .. t*planes+planes-1``), candidates unioned across
    tables before scoring. A neighbor is missed only if every table
    misses it, so recall converges to 1 geometrically in ``tables``
    while cost grows linearly — the standard LSH recall knob, and fully
    deterministic (the oracle replays every table). Measured by the
    ``knn_lsh_recall`` driver query against the exact result."""
    # norms hoisted to row grain (bit-identical — see cosine_topk)
    cbase = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        _norm(F.col(vec_col)).alias("__cn"),
    )
    qbase = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        _norm(F.col(vec_col)).alias("__qn"),
    )
    masks = [m for m in range(1 << planes) if bin(m).count("1") <= probe_hamming]
    cand = None
    for t in range(tables):
        c = with_lsh_bucket(cbase, "__cv", planes, dim, plane_offset=t * planes)
        q = with_lsh_bucket(
            qbase, "__qv", planes, dim, out_col="__b0", plane_offset=t * planes
        )
        q = q.withColumn(
            "bucket",
            F.explode(F.array(*[F.col("__b0").bitwiseXOR(F.lit(m)) for m in masks])),
        ).drop("__b0")
        pairs = c.join(F.broadcast(q), ["bucket"]).select(
            "query_id", "neighbor_id", "__qv", "__cv", "__qn", "__cn"
        )
        cand = pairs if cand is None else cand.unionByName(pairs)
    if tables > 1:
        # a pair found by several tables is one candidate; rows are
        # fully identical (bucket col dropped) so the dedup is
        # deterministic
        cand = cand.dropDuplicates(["query_id", "neighbor_id"])
    scored = (
        cand.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_sim",
            _dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_sim", 6).alias("cos_sim"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic Lloyd iterations for the IVF coarse quantizer —
    returns ``(__cid, __cent)`` ready for ``ivf_topk(centroids=...)``.

    Init = the ``n_centroids`` lowest-id vectors (seeded, zero-config,
    reproducible). Each iteration: nearest-centroid assignment by
    cosine (``assign_clusters`` — the centroid list folds into the
    projection, so the corpus never shuffles for assignment), then the
    element-wise cluster mean. The mean is summed in DECIMAL(27,12),
    not double: decimal addition is associative, so the result is
    bit-identical regardless of partitioning/partial-agg order — which
    is what lets an external engine (the DuckDB oracle) replay the
    training bit-for-bit. Empty clusters keep their previous centroid.

    At 100 TB: train on a bounded sample (pass ``corpus.sample(...)``
    or a ``limit``-ed frame) — centroid quality needs thousands of
    points, not the full corpus; full-corpus assignment happens once in
    ``ivf_topk`` and is written as a partition column.

    The centroid STATE lives on the driver between iterations — it is
    k·dim floats, definitionally driver-small (the literal fold already
    collects it every round, and the returned frame is a collected
    local relation either way). That makes each Lloyd iteration exactly
    ONE Spark job: the (cid,pos) decimal-mean aggregation, collected.
    The previous shape (per-iteration eager localCheckpoint of the
    centroid frame + a join against the previous round + a final
    collect) ran ~3 jobs per iteration; job count — not data volume —
    is the entire cost of training on a bounded sample, measured 7.0 s
    -> ~3 s for the 2-iteration/16-centroid bench quantizer. Cluster
    reassembly on the driver is pure reordering of the collected
    doubles (no float arithmetic), so results stay bit-identical.
    """
    as_double = lambda c: F.transform(c, lambda x: x.cast("double"))
    spark = corpus.sparkSession
    init = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(n_centroids)
        .select(F.col(id_col).alias("__cid"), as_double(vec_col).alias("__cent"))
    )
    schema = init.schema
    init_rows = init.collect()
    order = [r["__cid"] for r in init_rows]  # ascending-id init order
    cents = {r["__cid"]: list(r["__cent"]) for r in init_rows}
    base = corpus.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    for _ in range(iters):
        # the centroid frame is a LocalRelation: the literal strategy's
        # collect() is driver-local (no job), the join strategy
        # broadcasts it directly. Identical selection either way:
        # max(cos, -cid) == first row of (cos desc, cid asc).
        cent_df = spark.createDataFrame(
            [(cid, cents[cid]) for cid in order], schema
        )
        # training always takes the JOIN strategy (r6): the sample is
        # bounded by contract, so the join path's one n-row exchange
        # is trivial — while the literal path folds k*dim NEW literals
        # into every iteration's plan, whose whole-stage codegen
        # recompiles per iteration (no cache hit: the constants
        # change). The join plan is shape-identical across iterations
        # (only the broadcast local relation differs), and selection
        # is value-identical by the documented contract above.
        assigned = assign_clusters(
            base, cent_df, id_col="__id", vec_col="__v", out_col="__cid",
            strategy="join",
        ).select("__v", "__cid")
        means = (
            assigned.select("__cid", F.posexplode("__v").alias("__pos", "__x"))
            .groupBy("__cid", "__pos")
            .agg(
                # double FIRST, then decimal: float->decimal uses the
                # float's shortest decimal repr (can differ ~1e-9 from
                # the binary value an engine that widens float->double
                # first would see); double->decimal agrees across engines
                F.round(
                    F.sum(F.col("__x").cast("double").cast("decimal(27,12)"))
                    .cast("double")
                    / F.count(F.lit(1)),
                    6,
                ).alias("__m")
            )
        ).collect()  # k·dim rows — the one job of this iteration
        by_cid: dict = {}
        for r in means:
            by_cid.setdefault(r["__cid"], {})[r["__pos"]] = r["__m"]
        for cid in order:
            got = by_cid.get(cid)
            if got:  # empty clusters keep their previous centroid
                cents[cid] = [got[p] for p in range(len(got))]
    # the result feeds TWO broadcasts in ivf_topk (corpus assignment +
    # query probe); a local relation executes zero jobs per reuse
    return spark.createDataFrame([(cid, cents[cid]) for cid in order], schema)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_centroids: int = 16,
    n_probe: int = 4,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the classic ANN scale
    path next to ``lsh_bucketed_topk``.

    Coarse quantizer: ``n_centroids`` centroid vectors. Default pick =
    the ``n_centroids`` lowest-id corpus rows (deterministic, zero
    training — fine for tests/oracles); production passes real k-means
    centroids via ``centroids`` (a tiny ``(centroid_id, vec)`` frame)
    and nothing else changes. Build: one broadcast pass assigns every
    corpus vector to its nearest centroid by cosine — at 100 TB that
    assignment is written as a partition column so probing prunes
    files/partitions instead of scanning. Search: each query ranks the
    centroids, brute-forces only its ``n_probe`` nearest inverted
    lists. All ties (centroid assignment, ranking) break by id so the
    whole index is deterministic and SQL-twinnable.

    Why the probe is NOT int8-quantized (measured, round 5): stage
    attribution at the bench input (``tools/profile_ivf.py``) put
    k-means training at ~7.0 s and probe+re-rank at ~4.4 s of the
    15.6 s gate — training job count was the bottleneck, not probe
    arithmetic, so the fix was driver-side centroid state + smaller
    assignment expressions, then row-grain norm hoisting in the
    candidate scan (gate now ~5.9 s at the bench input). SQ8 probing
    (``quantize_embeddings``) stays available for corpora where the
    probe's decode bandwidth actually dominates — at this shape it
    would add a dequant step to a stage that is 25% of wall-clock.
    """
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    if centroids is None:
        centroids = (
            corpus.orderBy(F.col(id_col).asc())
            .limit(n_centroids)
            .select(F.col(id_col).alias("__cid"), F.col(vec_col).alias("__cent"))
        )
    else:
        cid, cvec = centroids.columns[:2]
        centroids = centroids.select(
            F.col(cid).alias("__cid"), F.col(cvec).alias("__cent")
        )

    # build-side assignment through assign_clusters: for small
    # quantizers it is a PURE PROJECTION over the corpus scan (zero
    # shuffle — the previous cross-join + per-id row_number window
    # shuffled all n*k candidate rows); above LITERAL_MAX_K it becomes
    # the broadcast-join argmax whose map-side partial max still ships
    # only n rows. Identical selection: max(cos, -cid) == first row of
    # (cos desc, cid asc).
    # corpus norms hoisted to row grain (bit-identical — see
    # cosine_topk): the candidate scan pays only the dot per pair
    assigned = assign_clusters(
        c, centroids, id_col="neighbor_id", vec_col="__cv", out_col="__cid"
    ).select(
        "neighbor_id", "__cv", "__cid", _norm(F.col("__cv")).alias("__cn")
    )

    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        _norm(F.col(vec_col)).alias("__qn"),
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("__ccos").desc(), F.col("__cid").asc()
    )
    # centroid norm hoisted onto the k-row broadcast frame (k folds
    # total instead of n_queries*k): same fold order and the same
    # (__qn * centroid_norm) multiplication order, so every __ccos bit
    # is unchanged
    probes = (
        q.join(
            F.broadcast(
                centroids.withColumn("__centn", _norm(F.col("__cent")))
            ),
            F.lit(True),
        )
        .withColumn(
            "__ccos",
            _dot(F.col("__qv"), F.col("__cent"))
            / (F.col("__qn") * F.col("__centn")),
        )
        .withColumn("__rn", F.row_number().over(probe_w))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "__qv", "__qn", "__cid")
    )

    scored = (
        assigned.join(F.broadcast(probes), ["__cid"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_sim",
            _dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_sim", 6).alias("cos_sim"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 4,
    dim: int = 64,
    exact: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (``id_a < id_b``).

    ``exact=True`` scores every pair (O(n²) — oracle/small-scale only);
    default buckets by hyperplane signs first so the self-join is
    per-bucket. Near-identical vectors land in the same bucket with
    prob ~ (1 - theta/pi)^planes, which is high at dedup thresholds.
    """
    # norms hoisted to row grain (bit-identical — see cosine_topk)
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        _norm(F.col(vec_col)).alias("__n"),
    )
    if exact:
        a, b = base.alias("a"), base.alias("b")
        joined = a.join(b, F.col("a.__id") < F.col("b.__id"))
    else:
        bucketed = with_lsh_bucket(base, "__v", planes, dim)
        a, b = bucketed.alias("a"), bucketed.alias("b")
        joined = a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
    sim = _dot(F.col("a.__v"), F.col("b.__v")) / (
        F.col("a.__n") * F.col("b.__n")
    )
    return (
        joined.select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.round(sim, 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


#: above this many centroids, ``assign_clusters(strategy="auto")``
#: switches from the literal-fold projection to the broadcast-join
#: argmax — a ``greatest`` chain over thousands of per-centroid struct
#: expressions blows up analysis/codegen long before SemDeDup's cited
#: ~1e5-cluster regime, while the join path is O(1) in expression size.
LITERAL_MAX_K = 100


def assign_clusters(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "cluster_id",
    strategy: str = "auto",
) -> DataFrame:
    """Nearest-centroid assignment. Ties -> smallest centroid id,
    matching the oracle's ``order by cos desc, cid asc`` in every
    strategy. ``centroids`` is a materialized ``(__cid, __cent)``
    frame from ``kmeans_centroids`` (driver-small by construction).

    Two plan shapes, picked by ``strategy``:

    * ``"literal"`` — a PURE PROJECTION, zero shuffle: the centroid
      list is folded into the plan itself; per row, ``greatest`` over
      k ``struct(cos, -cid)`` candidates picks the best cluster. At
      100 TB this is the difference between a map-only stage and a
      full-corpus shuffle — but the expression tree is O(k·dim)
      literals, so it only fits small quantizers (k <= ~1e2).
    * ``"join"`` — the paper-scale path (SemDeDup cites ~1e5 clusters):
      broadcast the centroid frame, cross every row with it, and take
      ``max(struct(cos, -cid))`` per row. Expression size is O(1) in
      k; the n·k candidate stream is collapsed to n rows BY THE
      MAP-SIDE PARTIAL AGGREGATE before the single exchange (the
      shuffle carries one (row, best-struct) record per input row, not
      n·k). Requires ``id_col`` to be unique — it is the grouping key
      (the remaining columns ride along via ``first()``).
    * ``"auto"`` (default) — ``literal`` when the centroid frame has
      <= ``LITERAL_MAX_K`` rows, else ``join``.
    """
    if strategy == "auto":
        # bounded probe, never a full collect: the join path exists
        # precisely because the centroid frame may be too big to fold
        # into the plan (1e5 rows x dim floats) — deciding the strategy
        # must not pull it to the driver either
        k = centroids.limit(LITERAL_MAX_K + 1).count()
        strategy = "literal" if k <= LITERAL_MAX_K else "join"
    if strategy == "literal":
        rows = centroids.collect()
        if not rows:
            raise ValueError("assign_clusters: centroids frame is empty")
        # the row-vector norm is hoisted to its own projection (computed
        # once per row — Catalyst keeps the two projections separate
        # because the attribute is referenced k times and is not cheap)
        # and each centroid's norm is folded left-to-right in Python
        # doubles — the IDENTICAL IEEE op sequence `_norm` runs on the
        # same literals, so cos values are bit-unchanged. Net effect:
        # k dot-folds + 1 norm-fold per row instead of 3k folds — the
        # expression tree (and its codegen) shrinks ~3x, which is the
        # entire cost of a map-only assignment over a bounded corpus.
        #
        # The whole k-candidate argmax is authored as ONE SQL string
        # parsed by a single F.expr call (r6): the per-centroid DSL
        # loop (zip_with/aggregate lambdas, struct, greatest) crossed
        # the py4j bridge hundreds of times per centroid, and that
        # driver-side chatter — not Spark jobs — was measured at
        # 1.3–2.9 s per assignment at k=16, paid once per k-means
        # iteration. The parsed tree is the same expression (same
        # lambdas, same literals via exact string round-trip, same
        # struct comparison), so every cos bit and tie-break is
        # unchanged.
        import math

        def _d(x: float) -> str:
            # repr() is the shortest decimal that round-trips to the
            # same double; string->double cast parses to nearest =
            # identical bits, and the cast constant-folds at plan time
            return f"cast('{x!r}' as double)"

        vcol = f"`{vec_col}`"
        cands = []
        for r in rows:
            arr = "array(" + ",".join(_d(float(x)) for x in r["__cent"]) + ")"
            acc = 0.0
            for x in r["__cent"]:
                xd = float(x)
                acc += xd * xd
            cn = math.sqrt(acc)
            dot = (
                f"aggregate(zip_with({vcol}, {arr},"
                " (x, y) -> cast(x as double) * cast(y as double)),"
                " cast(0.0 as double), (acc, v) -> acc + v)"
            )
            cands.append(
                f"named_struct('c', {dot} / (__vn * {_d(cn)}),"
                f" 'n', {-int(r['__cid'])}L)"
            )
        best = (
            f"greatest({','.join(cands)})" if len(cands) > 1 else cands[0]
        )
        vn = df.withColumn("__vn", _norm(F.col(vec_col)))
        return vn.withColumn(
            out_col, F.expr(f"cast(-(({best}).n) as bigint)")
        ).drop("__vn")
    if strategy != "join":
        raise ValueError(f"assign_clusters: unknown strategy {strategy!r}")
    if not centroids.head(1):
        # an empty broadcast side would silently drop EVERY input row
        # (cross join with zero rows), not assign a null cluster — fail
        raise ValueError("assign_clusters: centroids frame is empty")
    cent = centroids.select(
        F.col("__cid").cast("long").alias("__cid"),
        F.transform("__cent", lambda x: x.cast("double")).alias("__cent"),
    )
    # same hoists on the join path: centroid norms materialize WITH the
    # broadcast relation (k folds total, not k per input row), and the
    # streamed side computes its norm once per row in a pre-join
    # projection (codegen fuses it as a per-row local, reused across
    # the k build-side candidates)
    cent = cent.withColumn("__cn", _norm(F.col("__cent")))
    cand = F.struct(
        (_dot(F.col(vec_col), F.col("__cent")) / (F.col("__vn") * F.col("__cn"))).alias("c"),
        (-F.col("__cid")).cast("long").alias("n"),
    )
    # group by the id ALONE (long key -> cheap hash/sort agg), not the
    # full row: grouping on the embedding array forces a SortAggregate
    # that compares 64-float keys (~3x slower measured). Within a
    # group every non-id column is constant (id_col unique by
    # contract), so first() is deterministic in value.
    others = [c for c in df.columns if c != id_col]
    return (
        df.withColumn("__vn", _norm(F.col(vec_col)))
        .join(F.broadcast(cent), F.lit(True))
        .groupBy(id_col)
        .agg(
            F.max(cand).alias("__best"),
            *[F.first(c).alias(c) for c in others],
        )
        .withColumn(out_col, (-F.col("__best")["n"]).cast("long"))
        .select(*df.columns, out_col)
    )


def _semantic_dedup_grouped(
    assigned: DataFrame, threshold: float, id_col: str, vec_col: str
) -> DataFrame:
    """The ``pair_strategy="grouped"`` body of :func:`semantic_dedup`:
    per-cluster numpy pass replicating the JVM pair scan's exact IEEE
    op sequence (see the caller's docstring). Rows cross Arrow once;
    the column-chunked loop bounds memory at O(n·chunk) per cluster."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            assigned.schema[id_col],
            assigned.schema["cluster_id"],
            T.StructField("semantic_dup", T.BooleanType(), False),
        ]
    )
    thr = float(threshold)
    vcol = vec_col
    icol = id_col

    def flag(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(icol, kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vcol]])
        d = V.shape[1]
        # norm: sqrt(0.0 + sum_i v_i*v_i), left-to-right over dims —
        # the exact fold of `_norm` (widen-to-double is exact; numpy
        # add/mul are strict IEEE binary64, no FMA)
        acc = np.zeros(n)
        for i in range(d):
            acc = acc + V[:, i] * V[:, i]
        norms = np.sqrt(acc)
        dup = np.zeros(n, dtype=bool)
        chunk = 2048
        for j0 in range(1, n, chunk):  # column 0 has no lower-id mate
            j1 = min(j0 + chunk, n)
            W = V[j0:j1]
            # dot: 0.0 + sum_i a_i*b_i in dim order — `_dot`'s fold
            dots = np.zeros((n, j1 - j0))
            for i in range(d):
                dots = dots + V[:, i : i + 1] * W[:, i][None, :]
            cos = dots / (norms[:, None] * norms[j0:j1][None, :])
            rows = np.arange(n)[:, None]
            cols = np.arange(j0, j1)[None, :]
            # ids are sorted ascending and unique, so index < index
            # IS id < id; strict > threshold matches the JVM predicate
            dup[j0:j1] = ((cos > thr) & (rows < cols)).any(axis=0)
        return pd.DataFrame(
            {
                icol: pdf[icol],
                "cluster_id": pdf["cluster_id"],
                "semantic_dup": dup,
            }
        )

    return assigned.groupBy("cluster_id").applyInPandas(flag, schema=out_schema)


def semantic_dedup(
    df: DataFrame,
    centroids: DataFrame | None = None,
    threshold: float = 0.97,
    n_centroids: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign_strategy: str = "auto",
    broadcast_pairs: bool = False,
    pair_strategy: str = "join",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the corpus with the deterministic
    k-means coarse quantizer, then flag every vector whose cosine
    similarity to a LOWER-id vector in the SAME cluster exceeds
    ``threshold``. Lower-id-wins makes the kept set deterministic and
    fully SQL-replayable (no greedy iteration).

    Returns one row per input row: ``(id_col, cluster_id,
    semantic_dup)`` — callers drop ``semantic_dup`` rows to dedup.

    Scale shape: assignment is shuffle-free for small quantizers and
    a broadcast-join argmax above ``LITERAL_MAX_K`` centroids (see
    ``assign_clusters`` — ``assign_strategy`` passes through, so the
    paper's ~100k-cluster regime takes the O(1)-expression-size path
    automatically); the pairwise step is a self-join keyed on
    ``cluster_id``, so the quadratic blowup is bounded per cluster —
    ``n_centroids`` is the knob (the paper uses ~100k clusters at web
    scale so clusters stay ~1e4 rows; here 16 fits the test corpus).
    Training reads only the frame passed to ``kmeans_centroids``
    (callers pass a bounded sample at scale).

    ``broadcast_pairs=True`` runs the within-cluster EXISTS scan as a
    broadcast left-semi join (build = the assigned corpus) with the
    probe side re-spread to the session's shuffle width: the right
    plan when the corpus is bounded but the quantizer is SMALL — a
    16-value cluster key caps the shuffled semi-join at 16 tasks, one
    per cluster, so the quadratic per-cluster scan runs at 1/cores of
    the hardware and the densest cluster is the straggler (guide
    §2.5: skew a hash join cannot split). Leave False at the paper's
    web-scale regime, where the corpus cannot be broadcast and the
    ~1e5-value cluster key spreads the shuffle fine on its own.

    ``pair_strategy="grouped"`` replaces the pair JOIN entirely with a
    cogrouped-cluster pandas pass (``applyInPandas`` keyed on
    ``cluster_id``): each cluster's (id, vector) block crosses the
    Arrow boundary ONCE (rows, never pairs — guide §4.2/§8: move the
    lightweight proxy, decide in native code), and the n²/2 cosine
    tests run as 64 column-chunked numpy vector ops whose per-element
    IEEE sequence — widen to double, multiply, add left-to-right over
    dims starting from 0.0, sqrt, an*bn, divide, strict > — is the
    EXACT sequence of the JVM expression, so every flagged id is
    bit-identical (verified by the oracle gate and a dedicated test).
    Per-cluster memory is O(n·dim + n·chunk) — bounded by the same
    SemDeDup cluster-size contract (the paper's regime keeps clusters
    ~1e4 rows) that bounds the join paths' quadratic work. This is
    the fastest shape at ANY scale where clusters fit a task (the
    interpreted higher-order-function dot costs ~µs/pair; numpy runs
    the same arithmetic at ns/element), and the default for it stays
    off only because the JVM join paths are the zero-Python plans the
    rest of the engine's plan-audit story is built on.
    """
    if centroids is None:
        centroids = kmeans_centroids(
            df, n_centroids=n_centroids, iters=iters, id_col=id_col, vec_col=vec_col
        )
    assigned = assign_clusters(
        df.select(F.col(id_col), F.col(vec_col)),
        centroids, id_col, vec_col, strategy=assign_strategy,
    ).select(F.col(id_col), F.col(vec_col), F.col("cluster_id"))
    if pair_strategy == "grouped":
        # single consumer — no persist: the grouped pass reads the
        # assignment exactly once
        return _semantic_dedup_grouped(assigned, threshold, id_col, vec_col)
    # persist: `assigned` fans out THREE ways on the join paths (both
    # sides of the pair scan + the final left join); without it the
    # assignment — at large k a broadcast-join argmax aggregation —
    # re-executes per consumer (r6: ADVICE item, guide §5 reuse rule)
    assigned = assigned.persist()
    # The pair scan is where the time goes, so two plan devices — both
    # value-preserving, so the oracle replay stays bit-for-bit:
    #   1. Norms are hoisted to ROW grain before the join. cosine() as
    #      an inline expression re-aggregates BOTH operand norms for
    #      every pair; sqrt(sum(v_i^2)) over the same array is the same
    #      double wherever it is computed, and dot/(an*bn) is the
    #      identical arithmetic order, so hoisting cuts ~2/3 of the
    #      per-pair higher-order-function work without moving a bit.
    #      The projections sit below the cluster-key exchange, so the
    #      norm is materialized once per shuffled row, not re-inlined
    #      into the join condition.
    #   2. The dup test is EXISTS, not an enumeration: a LEFT SEMI join
    #      with the full predicate as the join condition lets the probe
    #      stop at the FIRST lower-id clustermate over the threshold
    #      (duplicates in dense clusters short-circuit early) and
    #      makes the old distinct() redundant — same id set, one fewer
    #      aggregate.
    a = assigned.select(
        F.col(id_col).alias("__aid"),
        F.col("cluster_id").alias("__ac"),
        F.col(vec_col).alias("__av"),
        _norm(F.col(vec_col)).alias("__an"),
    )
    b = assigned.select(
        F.col(id_col).alias("__bid"),
        F.col("cluster_id").alias("__bc"),
        F.col(vec_col).alias("__bv"),
        _norm(F.col(vec_col)).alias("__bn"),
    )
    if broadcast_pairs:
        nparts = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
        b = b.repartition(nparts)
        a = F.broadcast(a)
    dup_ids = (
        b.join(
            a,
            (F.col("__bc") == F.col("__ac"))
            & (F.col("__aid") < F.col("__bid"))
            & (
                _dot(F.col("__av"), F.col("__bv"))
                / (F.col("__an") * F.col("__bn"))
                > threshold
            ),
            "left_semi",
        )
        .select(F.col("__bid").alias(id_col))
        .withColumn("__dup", F.lit(True))
    )
    return (
        assigned.join(dup_ids, id_col, "left")
        .select(
            id_col,
            "cluster_id",
            F.coalesce("__dup", F.lit(False)).alias("semantic_dup"),
        )
    )


def linear_classifier_scores(
    df: DataFrame,
    dim: int = 64,
    bias: float = 0.0,
    seed: str = "clf",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Frozen-linear-head inference at corpus scale — how quality /
    toxicity / domain classifiers actually run over a 100 TB corpus:
    embeddings are precomputed once, the trained head is a weight
    vector applied as a pure projection (zero shuffle, zero UDF).

    The weight vector here is md5-derived (same determinism device as
    the LSH hyperplanes): weight_i = hash(seed:i)/2^32 - 0.5, so every
    executor — and the DuckDB oracle — recomputes the identical model
    with nothing to broadcast or store. A real trained head drops in
    as an ``F.array`` literal with the same plan shape.

    Output per row: ``logit`` (6dp), ``score`` = sigmoid(logit) (6dp),
    ``keep`` = logit > 0 (threshold at sigmoid 0.5; compare on the
    logit so the cut is exact, not a rounded-sigmoid comparison).
    """
    w = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            md5_long32(F.concat_ws(":", F.lit(seed), i.cast("string")))
            / F.lit(4294967296.0)
            - F.lit(0.5)
        ),
    )
    logit = _dot(F.col(vec_col), w) + F.lit(float(bias))
    return df.select(
        F.col(id_col),
        F.round(logit, 6).alias("logit"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6).alias("score"),
        (logit > 0).alias("keep"),
    )


def group_centroids(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    assemble: bool = False,
) -> DataFrame:
    """Per-group mean embedding (class centroids): posexplode the
    vector column and partial-aggregate by ``(group, pos)`` — the
    shuffle carries one (group, pos, decimal-sum, count) cell per
    dimension, never whole vectors, and decimal summation makes the
    mean independent of partitioning order (the kmeans_centroids
    discipline, reused).

    Default output is LONG form ``(group, pos, mean_val, n_members)``
    — directly joinable/oracle-checkable; ``assemble=True`` folds it
    to ``(group, centroid)`` arrays for use as ivf_topk/assign_clusters
    seeds (label-supervised coarse quantizer).
    """
    exploded = df.select(
        F.col(group_col).alias("grp"),
        F.posexplode(vec_col).alias("pos", "__x"),
    )
    long = exploded.groupBy("grp", "pos").agg(
        F.round(
            F.sum(F.col("__x").cast("double").cast("decimal(27,12)"))
            .cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_val"),
        F.count(F.lit(1)).alias("n_members"),
    )
    if not assemble:
        return long
    return long.groupBy("grp").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mean_val"))),
            lambda s: s["mean_val"],
        ).alias("centroid"),
        F.max("n_members").alias("n_members"),
    )


def random_project(
    df: DataFrame,
    in_dim: int,
    out_dim: int = 16,
    seed: str = "rp",
    vec_col: str = "embedding",
    out_col: str = "proj",
) -> DataFrame:
    """Sign-random-projection dimensionality reduction (Achlioptas
    ±1 / Johnson-Lindenstrauss): ``proj[j] = round(sum_i vec[i] *
    sign(seed, j, i), 6)`` with signs in {-1, +1}.

    The projection matrix is md5-derived — the same determinism device
    as the LSH hyperplanes and the frozen classifier head — but it is
    materialized DRIVER-SIDE into a literal constant folded into the
    plan, so the per-row cost is ``out_dim`` fused multiply-adds over
    the vector, not ``out_dim * in_dim`` hash calls. Zero shuffle,
    zero UDF, scan-time map; the natural pre-step that cuts the
    brute-force / IVF candidate cost ``in_dim/out_dim``-fold before
    exact re-ranking on the full vectors.

    Inner sums run in ascending ``i`` (both engines fold the list
    left-to-right in double), so the oracle — which re-derives every
    sign from md5 — reproduces the array bit-for-bit.
    """
    import hashlib

    def sign(j: int, i: int) -> float:
        h = int(hashlib.md5(f"{seed}:{j}:{i}".encode()).hexdigest()[:8], 16)
        return 1.0 if h % 2 == 1 else -1.0

    rows = [
        F.array(*[F.lit(sign(j, i)) for i in range(in_dim)])
        for j in range(out_dim)
    ]
    proj = F.array(
        *[
            F.round(_dot(F.col(vec_col), rows[j]), 6)
            for j in range(out_dim)
        ]
    )
    return df.withColumn(out_col, proj)


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    corpus_id: str = "vec_id",
    bench_id: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-space benchmark decontamination: flag every corpus
    vector whose cosine to ANY benchmark vector exceeds ``threshold``
    — the semantic sibling of the n-gram ``decontaminate`` operator
    (paraphrased eval items share no 8-gram but sit at cosine ~0.97).

    Contract mirrors n-gram decontamination: the benchmark set is
    SMALL (eval suites are thousands of items, the corpus is the 100
    TB side), so the benchmark frame is broadcast and the corpus is
    scanned ONCE with a per-row argmax over the broadcast side —
    an exact, shuffle-free plan (the corpus never repartitions; the
    only "join" is broadcast-nested-loop by design, same exemption
    class as exact kNN). For a benchmark too big to broadcast, bucket
    both sides with ``with_lsh_bucket`` and pay the recall haircut —
    that variant is ``lsh_bucketed_topk``'s shape, not this one.

    Deterministic tie: the matching benchmark id is the argmax of
    ``(cos, -bench_id)`` so equal cosines pick the smallest id.
    Output: ``(corpus_id, bench_id, cos_sim)`` for flagged vectors
    only — at a sane threshold the output is the (tiny) contamination
    report, never corpus-sized. When both id columns share a name the
    benchmark one surfaces as ``<name>_bench``.
    """
    bench_out = bench_id if bench_id != corpus_id else f"{bench_id}_bench"
    # norms hoisted to row grain (bit-identical — see cosine_topk)
    c = corpus.select(
        F.col(corpus_id).alias("__cid"),
        F.col(vec_col).alias("__cv"),
        _norm(F.col(vec_col)).alias("__cn"),
    )
    b = benchmark.select(
        F.col(bench_id).alias("__bid"),
        F.col(vec_col).alias("__bv"),
        _norm(F.col(vec_col)).alias("__bn"),
    )
    scored = c.join(F.broadcast(b)).select(
        "__cid",
        "__bid",
        (
            _dot(F.col("__cv"), F.col("__bv")) / (F.col("__cn") * F.col("__bn"))
        ).alias("__cos"),
    )
    best = (
        scored.groupBy("__cid")
        .agg(
            F.max(
                F.struct(F.col("__cos").alias("c"), (-F.col("__bid")).alias("nb"))
            ).alias("__m")
        )
        .select(
            F.col("__cid").alias(corpus_id),
            (-F.col("__m.nb")).alias(bench_out),
            F.round(F.col("__m.c"), 6).alias("cos_sim"),
        )
    )
    return best.filter(F.col("cos_sim") > threshold)


def cluster_medoids(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-group medoid — the real member closest (squared L2) to its
    group's mean embedding: the exemplar a curation report shows for
    each semantic cluster, and the prototype a few-shot pipeline pulls
    per class (a centroid is a synthetic average; the medoid is an
    actual row you can display and ship).

    Pipeline: :func:`group_centroids`' exact long-form means (decimal
    sums, 6dp), one equi-join back to the posexploded vectors on
    ``(group, pos)`` — the shuffle carries (id, group, pos, term)
    cells, never whole vectors — then the per-vector distance as a
    SORTED FOLD over pos-ordered terms (both engines fold ascending →
    bit-equal doubles), and the argmin per group by ``(d2, id)``
    row_number. Group cardinality bounds the final window's
    partitions; no global sort, no all-pairs anything.

    Output: ``(group, medoid_id, d2, n_members)``, d2 6dp.
    """
    cent = group_centroids(df, group_col, vec_col, assemble=False)
    ex = df.select(
        F.col(id_col).alias("__id"),
        F.col(group_col).alias("grp"),
        F.posexplode(vec_col).alias("pos", "__x"),
    )
    terms = ex.join(cent, ["grp", "pos"]).select(
        "__id",
        "grp",
        "pos",
        (
            (F.col("__x").cast("double") - F.col("mean_val"))
            * (F.col("__x").cast("double") - F.col("mean_val"))
        ).alias("__t"),
        "n_members",
    )
    d2 = terms.groupBy("__id", "grp").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("pos", "__t"))),
            F.lit(0.0),
            lambda acc, s: acc + s["__t"],
        ).alias("__d2"),
        F.max("n_members").alias("n_members"),
    )
    w = Window.partitionBy("grp").orderBy(
        F.col("__d2").asc(), F.col("__id").asc()
    )
    return (
        d2.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("grp").alias(group_col),
            F.col("__id").alias("medoid_id"),
            F.round("__d2", 6).alias("d2"),
            "n_members",
        )
    )


def centroid_distances(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Inter-centroid squared-L2 distance matrix — the cluster
    SEPARATION readout that pairs with :func:`cluster_medoids`'
    exemplars: near-zero off-diagonal distance means two labels (or
    two k-means cells) occupy the same region and semantic dedup /
    IVF probing will bleed between them.

    From :func:`group_centroids`' exact long form: a (pos)-keyed self
    equi-join of the k*dim centroid cells (k² * dim intermediate —
    centroid-scale, never data-scale), squared differences folded
    pos-ascending per pair (the sorted-fold bit-parity device), upper
    triangle only.

    Output: ``(grp_a, grp_b, d2)`` for grp_a < grp_b, 6dp.
    """
    c = group_centroids(df, group_col, vec_col, assemble=False)
    a = c.select(
        F.col("grp").alias("grp_a"), "pos", F.col("mean_val").alias("ma")
    )
    b = c.select(
        F.col("grp").alias("grp_b"), "pos", F.col("mean_val").alias("mb")
    )
    j = a.join(b, "pos").filter(F.col("grp_a") < F.col("grp_b"))
    t = j.select(
        "grp_a",
        "grp_b",
        "pos",
        ((F.col("ma") - F.col("mb")) * (F.col("ma") - F.col("mb"))).alias(
            "__t"
        ),
    )
    return t.groupBy("grp_a", "grp_b").agg(
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("pos", "__t"))),
                F.lit(0.0),
                lambda acc, s: acc + s["__t"],
            ),
            6,
        ).alias("d2")
    )


def centroid_drift(
    df: DataFrame,
    group_col: str,
    period_col: str,
    vec_col: str = "embedding",
    pre: str = "pre",
    post: str = "post",
    max_dim: int | None = None,
) -> DataFrame:
    """Semantic drift monitor: per group, the cosine similarity
    between the group's PRE-period and POST-period mean embeddings —
    "did what this source/segment talks about move?" as one number
    per group, the embedding-space twin of ``psi_drift``.

    Fully relational, no vector ever crosses a shuffle whole:
    posexplode to (group, period, dim) cells, decimal partial-agg
    means (order-free), ONE equi-join of the pre/post per-dimension
    mean frames on (group, dim) — dimension-scale, not data-scale —
    then dot/norm sums per group with products cast DECIMAL(27,12) so
    the d-term sums are order-free too; cosine is one sqrt+division
    readout in double, 6dp. Groups missing either period are honestly
    absent (the join is inner). Degenerate all-zero centroids yield
    NULL via the zero-norm guard.
    """
    d = df.select(
        F.col(group_col).alias("g"),
        F.col(period_col).alias("p"),
        F.col(vec_col).alias("v"),
    ).filter(F.col("v").isNotNull() & F.col("p").isin(pre, post))
    if max_dim is not None:
        d = d.withColumn("v", F.slice("v", 1, int(max_dim)))
    cells = d.select(
        "g", "p", F.posexplode("v").alias("dim", "x")
    ).select(
        "g", "p", "dim",
        F.col("x").cast("double").cast("decimal(27,12)").alias("x"),
    )
    means = cells.groupBy("g", "p", "dim").agg(
        (F.sum("x").cast("double") / F.count(F.lit(1)).cast("double"))
        .alias("m")
    )
    a = means.filter(F.col("p") == pre).select(
        "g", "dim", F.col("m").alias("ma")
    )
    b = means.filter(F.col("p") == post).select(
        "g", "dim", F.col("m").alias("mb")
    )
    j = a.join(b, ["g", "dim"]).select(
        "g",
        (F.col("ma") * F.col("mb")).cast("decimal(27,12)").alias("ab"),
        (F.col("ma") * F.col("ma")).cast("decimal(27,12)").alias("aa"),
        (F.col("mb") * F.col("mb")).cast("decimal(27,12)").alias("bb"),
    )
    s = j.groupBy("g").agg(
        F.sum("ab").cast("double").alias("ab"),
        F.sum("aa").cast("double").alias("aa"),
        F.sum("bb").cast("double").alias("bb"),
    )
    return s.select(
        F.col("g").alias(group_col),
        F.when(
            (F.col("aa") > 0) & (F.col("bb") > 0),
            F.round(
                F.col("ab") / (F.sqrt(F.col("aa")) * F.sqrt(F.col("bb"))), 6
            ),
        ).alias("drift_cosine"),
    )
