"""Embedding-column utility transforms (vector compression).

:func:`quantize_embeddings` — per-dimension affine int8 quantization
of an ``array<float>`` embedding column: the standard 4x memory /
bandwidth cut applied to a vector corpus before ANN indexing or
shipping to a feature store. Asymmetric min/max quantization (the
ONNX/ FAISS ``SQ8`` convention): per dimension d, ``code = floor(
(x - min_d) * 255 / (max_d - min_d))`` clamped to [0, 255].

Plan shape, and why it scales: pass 1 computes per-dimension min/max
by ``posexplode`` + partial agg — the explode multiplies rows by the
dimension count, but map-side combine collapses every partition to
(n_dims) rows before the one tiny shuffle (n_dims keys is not skew:
the combine means each reducer key receives one pre-aggregated row
per map partition, not the raw rows). Pass 2 never shuffles at all:
the (n_dims)-row parameter table is a driver-safe scalar read (the
same tiny-driver-read class as quantile_bin boundaries) folded into a
literal array, and codes are computed by a whole-stage-codegen
``transform`` over the vector column — no UDF, no join, scan-only.
At 100 TB the only change is deriving params from a sample or a
frozen training snapshot (which production quantizers want anyway so
serving codes match the index); pass 2 is unchanged.

Determinism: float->double widening is exact, min/max are exact, and
the affine expression is the same fixed IEEE op order in Spark and
DuckDB, so codes replay bit-for-bit (``least(.., 255)`` guards the
one-ULP case where ``(max-min)*255/(max-min)`` rounds up).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dimension_params(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension ``(dim, vmin, vmax)`` over the corpus; dim is the
    0-based position. One posexplode + partial-agg pass (see module
    docstring for why n_dims grouping keys is not a skew problem)."""
    return (
        df.select(F.posexplode(vec_col).alias("dim", "__x"))
        .filter(F.col("__x").isNotNull())
        .groupBy("dim")
        .agg(
            F.min(F.col("__x").cast("double")).alias("vmin"),
            F.max(F.col("__x").cast("double")).alias("vmax"),
        )
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    params: DataFrame | None = None,
) -> DataFrame:
    """Int8-quantize ``vec_col``: returns ``(id_col, codes)`` with
    ``codes`` an ``array<int>`` of [0, 255] levels, one per dimension.

    ``params``: optional pre-computed / frozen ``dimension_params``
    frame (training-snapshot mode); defaults to params over ``df``
    itself. Constant dimensions (vmax == vmin) map to code 0.
    """
    p = params if params is not None else dimension_params(df, vec_col)
    rows = sorted(p.collect(), key=lambda r: r["dim"])  # n_dims rows
    lits = F.array(
        *[
            F.struct(
                F.lit(float(r["vmin"])).alias("vmin"),
                F.lit(float(r["vmax"])).alias("vmax"),
            )
            for r in rows
        ]
    )
    def _code(x, i):
        pr = F.element_at(lits, i + F.lit(1))
        rng = pr["vmax"] - pr["vmin"]
        raw = F.floor(
            (x.cast("double") - pr["vmin"]) * F.lit(255.0) / rng
        )
        return (
            F.when(rng > 0, F.least(raw, F.lit(255).cast("long")))
            .otherwise(F.lit(0).cast("long"))
            .cast("int")
        )

    return df.select(
        F.col(id_col), F.transform(F.col(vec_col), _code).alias("codes")
    )


def embedding_covariance(
    df: DataFrame,
    vec_col: str = "embedding",
    max_dim: int | None = None,
) -> DataFrame:
    """Population covariance matrix of the embedding dimensions —
    the one-pass statistic under PCA whitening, feature-redundancy
    audits, and Mahalanobis outlier scoring over a vector corpus.

    Returns the upper triangle ``(dim_i, dim_j, n, cov)`` with
    ``dim_i <= dim_j`` (the matrix is symmetric; materializing both
    halves doubles shuffle bytes for zero information).

    Plan shape, and why it scales: ONE scan. Each vector explodes to
    its d(d+1)/2 upper-triangle cell products — the d² blowup is the
    irreducible arithmetic of a covariance matrix, not a join — and a
    partial agg keyed ``(dim_i, dim_j)`` collapses every map partition
    to d(d+1)/2 rows before the one tiny shuffle (same
    combine-dominates argument as :func:`dimension_params`). Nothing
    ever shuffles at vector grain. ``max_dim`` truncates leading
    dimensions for wide embeddings where only a prefix block is
    audited.

    Determinism device (repo-wide): per-cell products ``x_i * x_j``
    are computed in double (float->double widening exact, one IEEE
    multiply — identical in any engine) then CAST TO DECIMAL(27,12)
    so the partial-agg SUM is order-free; per-dimension sums take the
    same device. The closed form
    ``cov = sxy/n - (sx/n)*(sy/n)`` runs on decimal->double readouts
    with a fixed op shape, rounded to 6dp.
    """
    d = df.select(F.col(vec_col).alias("v")).filter(F.col("v").isNotNull())
    if max_dim is not None:
        d = d.select(F.slice("v", 1, int(max_dim)).alias("v"))
    cells = (
        d.select(F.posexplode("v").alias("dim_i", "xi"), F.col("v"))
        .select(
            "dim_i",
            F.col("xi").cast("double").alias("xi"),
            F.posexplode("v").alias("dim_j", "xj"),
        )
        .filter(F.col("dim_j") >= F.col("dim_i"))
        .select(
            "dim_i",
            "dim_j",
            F.col("xi").cast("decimal(27,12)").alias("sxi"),
            F.col("xj").cast("double").cast("decimal(27,12)").alias("sxj"),
            (F.col("xi") * F.col("xj").cast("double"))
            .cast("decimal(27,12)")
            .alias("sxy"),
        )
    )
    agg = cells.groupBy("dim_i", "dim_j").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("sxi").alias("sxi"),
        F.sum("sxj").alias("sxj"),
        F.sum("sxy").alias("sxy"),
    )
    n = F.col("n").cast("double")
    return agg.select(
        "dim_i",
        "dim_j",
        F.col("n").cast("bigint").alias("n"),
        F.round(
            F.col("sxy").cast("double") / n
            - (F.col("sxi").cast("double") / n)
            * (F.col("sxj").cast("double") / n),
            6,
        ).alias("cov"),
    )


def embedding_health(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "doc_id",
) -> DataFrame:
    """Embedding-column health audit — before any ANN/dedup/centroid
    job trusts a vector column, the three failure modes worth a scan:
    NULL vectors, ZERO vectors (a norm-0 vector poisons cosine math
    with NaN), and dimensionality drift (a mixed-dim column breaks
    every dot product downstream). Plus the squared-norm distribution
    (p10/p50/p90 by exact rank selection) — collapsed or exploding
    norms are the classic sign of a broken encoder export.

    Determinism: per-row ``norm2`` is a SEQUENTIAL array fold
    (``F.aggregate`` — fixed order, bit-stable in any engine that
    folds left-to-right, which both Spark and DuckDB list_reduce do);
    percentiles are rank selections over the norm order with the id
    as tiebreak. One scan + one rank window.

    Output: one row ``(n_rows, n_null, n_zero, n_dims_min,
    n_dims_max, p10_norm2, p50_norm2, p90_norm2)``.
    """
    from pyspark.sql import Window

    v = F.col(vec_col)
    norm2 = F.aggregate(
        v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    base = df.select(
        F.col(id_col).alias("__id"),
        v.isNull().cast("long").alias("__isnull"),
        F.when(v.isNotNull(), F.size(v)).alias("__dims"),
        F.when(v.isNotNull(), F.round(norm2, 9)).alias("__n2"),
    )
    w = Window.orderBy(F.col("__n2").asc(), F.col("__id").asc())
    wa = Window.partitionBy(F.lit(1))
    ranked = base.filter(F.col("__n2").isNotNull()).withColumn(
        "__rk", F.row_number().over(w)
    ).withColumn("__n", F.count(F.lit(1)).over(wa))

    def pick(p_milli):
        tgt = F.greatest(
            F.floor((F.lit(p_milli) * F.col("__n") + 999) / 1000).cast(
                "long"
            ),
            F.lit(1),
        )
        return F.max(F.when(F.col("__rk") == tgt, F.col("__n2")))

    stats = base.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("__isnull").alias("n_null"),
        F.sum((F.col("__n2") == 0.0).cast("long")).alias("n_zero"),
        F.min("__dims").alias("n_dims_min"),
        F.max("__dims").alias("n_dims_max"),
    )
    pcts = ranked.agg(
        pick(100).alias("p10_norm2"),
        pick(500).alias("p50_norm2"),
        pick(900).alias("p90_norm2"),
    )
    return stats.crossJoin(F.broadcast(pcts))  # 1-row (cuped class)
