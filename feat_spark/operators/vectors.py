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
