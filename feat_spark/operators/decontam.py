"""Benchmark decontamination — flag training documents that overlap an
evaluation set.

The standard contamination rule for LLM training corpora: a document is
contaminated when it shares any word n-gram (n≈8..13) with a benchmark
document. Relational shape:

* benchmark → distinct n-grams (the SMALL side: benchmarks are a few
  thousand rows; their n-gram set broadcast-joins against the corpus);
* corpus → exploded distinct n-grams (one narrow (doc_id, gram) frame —
  the only wide thing in the pipeline, and it never shuffles: the
  broadcast hash join probes it in the scan stage);
* hit counts per doc via partial-agg count.

At 100 TB the corpus side stays embarrassingly parallel: no shuffle of
corpus data at all when the benchmark gram set fits a broadcast (tens
of millions of grams ≈ a few hundred MB — fine); beyond that, the same
plan with the broadcast hint dropped degrades gracefully to a shuffled
hash join keyed by gram.

The n-gram inventory reuses ``functions.text.word_shingles`` (the
dedup shingler), so engine and DuckDB oracle share one tokenization
discipline (the reference's stable-identity rule,
/root/reference/src/feat.erl:459-461, applied to decontamination).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feat_spark.functions.text import word_shingles


def contamination_flags(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 8,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-document contamination report vs ``benchmark``.

    Output: ``(doc_id, n_contaminated_grams, contaminated)`` — one row
    per corpus doc, ``n_contaminated_grams`` = how many of the doc's
    DISTINCT n-grams appear anywhere in the benchmark (0 for clean
    docs), ``contaminated`` = that count > 0. Deterministic; thresholds
    beyond >0 are the caller's policy (filter on the count).

    ``n`` defaults to 8 words — large enough that boilerplate phrases
    don't false-positive, small enough to catch verbatim leakage.
    """
    bt = bench_text_col or text_col
    grams = (
        benchmark.select(F.explode(word_shingles(bt, n)).alias("__g"))
        .distinct()
    )
    if broadcast_benchmark:
        grams = F.broadcast(grams)
    doc_grams = corpus.select(
        F.col(id_col).alias("__id"), F.explode(word_shingles(text_col, n)).alias("__g")
    )
    hits = (
        doc_grams.join(grams, "__g")
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
    )
    return (
        corpus.select(F.col(id_col).alias("__id"))
        .join(hits, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("n_contaminated_grams", F.lit(0)).cast("long").alias(
                "n_contaminated_grams"
            ),
            (F.coalesce("n_contaminated_grams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 8,
) -> DataFrame:
    """Corpus rows with every contaminated doc dropped (left_anti on
    the >0-hits set — corpus columns pass through untouched)."""
    bt = bench_text_col or text_col
    grams = F.broadcast(
        benchmark.select(F.explode(word_shingles(bt, n)).alias("__g")).distinct()
    )
    dirty = (
        corpus.select(F.col(id_col), F.explode(word_shingles(text_col, n)).alias("__g"))
        .join(grams, "__g")
        .select(id_col)
        .distinct()
    )
    return corpus.join(dirty, id_col, "left_anti")
