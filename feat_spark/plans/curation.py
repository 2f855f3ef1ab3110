"""End-to-end corpus curation: the composed pipeline a training-data
owner actually runs, built entirely from this engine's operators —

    quality gate -> exact dedup -> near-dup component drop -> sample

Each stage is the already-verified primitive (functions.text.quality_score,
md5 row_number dedup, dedup.minhash_dedup_pairs + connected_components,
sampling.hash_sample); this module only fixes their composition order
and the keep/drop conventions, so the whole pipeline inherits the
per-stage oracles and is itself driver-gated end to end
(`curation_pipeline` in __spark_entry__.py).

Composition rules that matter for correctness:
* exact dedup runs BEFORE near-dup: identical texts produce identical
  MinHash signatures, so leaving them in just burns LSH work and
  inflates bucket sizes (the degenerate case ``max_bucket`` exists for);
* near-dup pairs are computed on the POST-filter corpus — a dropped
  low-quality doc must not act as the bridge that merges two clusters
  (and must never be the kept representative);
* the kept near-dup representative is the component-min doc id —
  deterministic, and consistent with exact dedup's min-id rule;
* sampling is LAST (a sample of the deduped corpus, not a dedup of the
  sample) and hash-gated, so the final set is layout-independent and
  replayable.

Scale: stages 1-2 are a map + one shuffle; stage 3 is the LSH
pipeline's equi-joins + O(diameter) HashMin rounds; stage 4 is a map.
Nothing materializes more than (id, hash)-width intermediates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from feat_spark.functions.text import quality_score
from feat_spark.operators.dedup import connected_components, minhash_dedup_pairs
from feat_spark.operators.sampling import hash_sample


def curate_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_floor: float = 0.2,
    near_dup_threshold: float = 0.6,
    minhash_k: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket: int | None = 1000,
    sample_pct: int = 100,
    salt: str = "s",
) -> DataFrame:
    """Return the curated corpus (surviving rows of ``df``).

    ``max_bucket`` defaults ON (1000): production corpora are exactly
    where a boilerplate LSH bucket goes degenerate, and forgetting to
    enable the cap there is the foot-gun the round-2 verdict flagged.
    1000 caps the worst bucket at ~500k pairs (one heavy-but-bounded
    task) while being far above any bucket an honest near-dup corpus
    produces; pass ``None`` to disable (exact parity with the uncapped
    pipeline). Note exact dedup runs BEFORE the LSH stage, so capped
    buckets here hold near- (not exact-) duplicates — the lossy case of
    the cap (see ``lsh_candidate_pairs``) only affects sub-threshold
    hub links inside one pathological bucket.
    """
    kept = df.filter(quality_score(F.col(text_col)) >= quality_floor)

    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    kept = (
        kept.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    pairs = minhash_dedup_pairs(
        kept, id_col=id_col, text_col=text_col, k=minhash_k, bands=bands,
        n=shingle_n, threshold=near_dup_threshold, max_bucket=max_bucket,
    )
    comps = connected_components(pairs)
    non_reps = comps.filter(F.col("component") != F.col("doc_id")).select(
        F.col("doc_id").alias(id_col)
    )
    kept = kept.join(non_reps, id_col, "left_anti")

    if sample_pct < 100:
        kept = hash_sample(kept, id_col, sample_pct, salt=salt)
    return kept



def source_curation_stats(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    min_quality: float = 0.2,
    max_dup_frac: float = 0.2,
) -> DataFrame:
    """Domain-level curation (the RefinedWeb/C4 stage BEFORE per-doc
    filtering): aggregate per-source health — doc count, mean quality,
    english fraction, exact-dup fraction — and flag sources to block
    wholesale. Blocking a rotten domain up front becomes a partition
    prune at the scan (source is a natural partition column), orders
    of magnitude cheaper than per-doc filtering the same bytes.

    One pass over the corpus, one partial-agg shuffle keyed by source.
    Mean quality is decimal-summed (order-free => oracle-replayable);
    ``blocked`` compares on the ROUNDED stats so the decision is
    bit-stable cross-engine.

    Output: ``(source, n_docs, mean_quality, pct_english, dup_frac,
    blocked)``.
    """
    from feat_spark.functions.text import langid_en

    per_doc = df.select(
        F.col(source_col).alias("source"),
        quality_score(text_col).alias("__q"),
        (langid_en(text_col) == F.lit("en")).alias("__en"),
        F.md5(F.col(text_col)).alias("__h"),
    )
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum(F.col("__q").cast("decimal(27,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_quality"),
        F.round(
            F.sum(F.col("__en").cast("long")) / F.count(F.lit(1)), 6
        ).alias("pct_english"),
        F.round(
            F.lit(1.0) - F.countDistinct("__h") / F.count(F.lit(1)), 6
        ).alias("dup_frac"),
    )
    return agg.withColumn(
        "blocked",
        (F.col("mean_quality") < min_quality)
        | (F.col("dup_frac") > max_dup_frac),
    )
