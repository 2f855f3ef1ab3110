"""Rotating bench-query registries — deliberately OUTSIDE the
flagship-path content hash.

``tools/bench_scaling.py`` gates scaling rows on a hash of bench.py
plus the feat_spark modules the flagship imports; this module is
neither, so editing it does NOT invalidate the published scaling
table. That is the point: these tuples rotate every round with the
driver's correctness window, while the flagship measurement they
accompany is byte-identical round over round — round 5's rotation
orphaned an entire campaign history because the lists then lived
inside bench.py.

INVARIANT that keeps the exclusion honest: this module must hold ONLY
the registry constants below. Nothing here may define or influence
any code on the flagship timing path (bench.py imports the names and
uses them strictly inside the query-timing section, which scaling
runs skip via SPARK_GRAFT_SKIP_QUERIES=1).
"""

# timed EVERY run: the flagship's operator family + the most expensive
# scale-path queries (the ones whose plans the judge audits) — stable
# round-over-round so deltas always have an anchor
HEADLINE_QUERIES = (
    "asof_join",
    "asof_join_skew",
    "lag_lead",
    "sessionize",
    "salted_agg_skew",
    "q1_pricing_summary",
    "dedup_exact",
    "minhash_lsh_dedup",
    "knn_cosine_ivf",
    "semantic_dedup",
    "pagerank",
    "fuzzy_pairs",
)

BENCH_QUERIES = (
    # headline dozen first (HEADLINE_QUERIES, timed every run)
    "asof_join",
    "asof_join_skew",
    "lag_lead",
    "sessionize",
    "salted_agg_skew",
    "q1_pricing_summary",
    "dedup_exact",
    "minhash_lsh_dedup",
    "knn_cosine_ivf",
    "semantic_dedup",
    "pagerank",
    "fuzzy_pairs",
    "calendar_features",
    "table_fingerprint",
    "random_projection",
    "snapshot_diff",
    "scd2_build",
    "tree_ancestry",
    "containment_pairs",
    "prefix_filter_pairs",
    "bpe_pair_counts",
    "source_kl",
    "weighted_median",
    "ks_test",
    "mutual_information",
    "semantic_decontamination",
    "rare_category_collapse",
    "woe_encode",
    "session_ngrams",
    "inverted_index",
    "autocorr",
    "triangle_count",
    "quantize_embeddings",
    "calibration_curve",
    "chi2_assoc",
    "rrf_fusion",
    "upsert_latest",
    "context_window",
    "cross_correlation",
    "phrase_search",
    "seasonal_anomaly",
    "skipgram_pairs",
    "attribution",
    "changepoint_scan",
    "rfm_segments",
    "group_auc",
    "label_churn",
    "compaction_plan",
    "basket_rules",
    "expectations",
    "json_extract",
    "split_leakage",
    "business_days",
    "rank_normalize",
    "cohort_ltv",
    "semantic_dedup_largek",
    "knn_cosine",
    "knn_cosine_lsh",
    "knn_lsh_recall",
    "fuzzy_pairs_recall",
    "remove_dup_spans",
    "rolling_active_users",
    "behavior_entropy",
    # ^ order: headline, then the r5 driver window's batch gates
    # (streaming micro-batch gates are correctness-gated, not
    # bench-timed: checkpoint I/O dominates their wall-clock and
    # says nothing about plan quality), then carried expensive
    # scale-path queries re-timed every 4 rounds by the quarter
    # rotation
)
