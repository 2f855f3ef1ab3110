"""Physical-plan quality gate.

The correctness gate (selfcheck) proves the answers right; this proves
the PLANS are the ones a 1000-executor cluster wants:

* parquet scans read only referenced columns (ReadSchema pruning) and
  carry pushed filters where the query filters the scan;
* dimension joins broadcast (no full shuffle of the fact side);
* no accidental CartesianProduct / BroadcastNestedLoopJoin anywhere
  except the brute-force kNN (explicitly exempted: scoring every
  corpus vector is its contract);
* every per-key window pipeline shuffles at most the expected number
  of times.

Run: python tools/plancheck.py [sf_dir]
Exit 1 on any violation; prints one line per query.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from feat_spark.session import get_spark  # noqa: E402

#: queries allowed a nested-loop/cartesian: exact kNN + exact near-dup
#: score ALL pairs by contract; IVF crosses every vector with the TINY
#: broadcast centroid set (16 rows) to build/probe the index.
NL_EXEMPT = {"knn_cosine", "embedding_near_dup", "knn_cosine_ivf",
             # recall metric joins the exact kNN (broadcast NL by
             # contract) against the LSH result; kmeans training also
             # crosses the tiny broadcast centroid set
             "knn_lsh_recall",
             # label-agreement metric is built on the exact kNN
             "knn_label_agreement",
             # corpus x broadcast-benchmark argmax is broadcast-NL by
             # contract (the benchmark side is eval-suite-small)
             "semantic_decontamination",
             # joins the ONE-row grand-totals aggregate onto the
             # k-row top list — a 1xk broadcast NL join by design
             "skew_report",
             # same class: the 1-row (total_ref, total_cur) aggregate
             # crossed onto the n_bins-row bin-count frame
             "psi_drift",
             # same class: the 1-row pooled-theta aggregate crossed
             # onto the variant-count-row per-variant frame
             "cuped_adjust",
             # large-k assignment crosses every row with the BROADCAST
             # centroid frame by contract (assign_clusters
             # strategy="join"); the map-side partial max collapses the
             # n*k stream to n rows before the one exchange
             "semantic_dedup_largek",
             # same 1-row class as cuped_adjust: the single-row grand-
             # total frame crossed onto the (group x strata)-sized cell
             # frame to form pooled weights
             "standardized_rates",
             # same 1-row class: the one-row (N, agree) totals frame
             # crossed onto the one-row sum-of-margin-products frame
             "cohens_kappa",
             # same 1-row class as cuped_adjust: the one-row
             # method-of-moments prior frame crossed onto the per-key
             # rate frame
             "eb_shrink_rates",
             # same 1-row class: the one-row sorted-fold normalizer
             # crossed onto the bounded stratum frame
             "neyman_allocation",
             # same 1-row class: the one-row median and one-row MAD
             # frames crossed onto the bounded day series
             "seasonal_outliers",
             # same 1-row class: the one-row percentile frame crossed
             # onto the one-row stats frame
             "embedding_health",
             # same 1-row class: the one-row minority-label and
             # majority-count frames crossed onto the scan (the keep
             # rule is a filter, not a join)
             "class_balance",
             # same 1-row class: the one-row sketch estimate crossed
             # onto the one-row exact-join-size frame
             "cms_join_size"}

#: max Exchange nodes allowed (shuffles; BroadcastExchange excluded).
#: window/sessionize pipelines must reuse ONE exchange.
MAX_EXCHANGES = {
    "stable_order": 1, "lag_lead": 1, "cumulative": 1, "forward_fill": 1,
    "backward_fill": 1, "sessionize": 1, "session_agg": 2,
    # 2 = rhs dedup window (keyed o_custkey,o_orderdate) + the as-of
    # union-window exchange (user_id); the OPERATOR itself costs one
    "asof_join": 2, "asof_join_tolerance": 2,
    "tumbling_window": 1, "sliding_window": 1, "topk_per_group": 1,
    # 2 = Spark's two-phase distinct aggregation (expand on
    # (user_id,event_type), then final by user_id) — optimal distributed
    # exact-distinct, not a planning mistake
    "distinct_agg": 2, "q1_pricing_summary": 1,
    "feature_extract": 0, "feature_hash_extract": 0, "text_stats": 0,
    "lang_quality": 0, "doc_fingerprint": 0,
    # broadcast-dim join: the orders side must NOT shuffle
    "segment_revenue_broadcast": 1,
    # one rangeBetween window = one exchange, like the row-frame ops
    "time_range_rolling": 1,
    # rhs-dedup window + the directional union-window exchange
    "asof_join_forward": 2,
    # nearest = backward + forward passes over the same key: the rhs
    # dedup exchange plus two union-window exchanges
    "asof_join_nearest": 4,
    # semi/anti against a small filtered build side must broadcast
    "semi_join": 0, "anti_join": 0,
    # expand + single hash aggregate
    "grouping_sets": 1,
    # pivot = two-phase aggregate on the group key
    "pivot_event_counts": 2,
    # two window specs sharing one hashpartitioning(user_id) exchange
    "ranking_functions": 1,
    # pure lateral explode: no shuffle at all
    "word_explode": 0,
    "feature_extract_union": 0, "feature_extract_set": 0,
    # the sketch row now carries its exact counterparts for the oracle
    # bound-check -> Spark's two-phase exact-distinct (expand + final),
    # same shape as distinct_agg
    "sketches": 2,
    # mapInPandas over the scan: no shuffle
    "media_features": 0,
    # all dims broadcast: ONE shuffle for the final aggregate, the
    # lineitem fact side never exchange-partitions for the joins
    "q3_shipping_priority": 1, "q5_local_supplier_volume": 1,
    # salt partial + merge: exactly two hash aggregates, two exchanges
    "salted_agg_skew": 2,
    # pure regex map over the scan: no shuffle at all
    "pii_scrub": 0,
    # hash-gate filter over the scan: no shuffle at all
    "stratified_sample": 0,
    # (key,chunk) intra window + per-chunk totals agg + per-key offset
    # window; offsets rejoin via broadcast (no fourth exchange)
    "chunked_cumulative": 3,
    # explode -> (doc,word) agg -> word-keyed df join -> per-doc window
    "tfidf_keywords": 4,
    # (doc,gram) partial agg + per-doc final agg
    "repetition_stats": 2,
    # benchmark-gram distinct + per-doc hit agg; corpus side NEVER
    # shuffles (gram set and hit counts broadcast back)
    "decontamination": 2,
    # one per-shard prefix-sum window
    "pack_sequences": 1,
    # the per-shard agg reuses the window's shard partitioning
    "packing_stats": 1,
    # one stratum group-by; the global-total window runs on the |strata|-
    # row aggregate (SinglePartition over a handful of rows, not counted)
    "corpus_mix": 1,
    # rates resolved driver-side -> the data pass is a pure scan filter
    "mixture_sample": 0,
    # one gram-keyed partial-agg group-by
    "ngram_freq": 1,
    # the WHOLE composed matrix = rhs dedup window + the as-of
    # union-window exchange; every feature window reuses that exchange
    "feature_matrix": 2,
    # pure explode over the scan
    "chunk_documents": 0,
    # gram totals agg + gram join + per-doc agg
    "span_dup_stats": 3,
    # 3 stage aggregates + stage joins over the sessionized frame; the
    # gate recomputes the session window per stage branch (at scale the
    # sessionized table is materialized once upstream and the funnel
    # runs over it — 3 session-keyed aggs + 2 joins)
    "session_funnel": 7,
}

#: queries whose scan must show a pushed filter
PUSHED_FILTER_EXPECTED = {"q1_pricing_summary"}


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def check(name: str, plan: str) -> list[str]:
    problems = []
    if name not in NL_EXEMPT and re.search(
        r"CartesianProduct|BroadcastNestedLoopJoin", plan
    ):
        problems.append("nested-loop/cartesian join in plan")
    n_ex = len(re.findall(r"\bExchange hashpartitioning", plan)) + len(
        re.findall(r"\bExchange rangepartitioning", plan)
    )
    cap = MAX_EXCHANGES.get(name)
    if cap is not None and n_ex > cap:
        problems.append(f"{n_ex} shuffles (cap {cap})")
    if name in PUSHED_FILTER_EXPECTED and "PushedFilters: [" not in plan.replace(
        "PushedFilters: []", ""
    ):
        problems.append("no pushed filters on scan")
    # column pruning: a scan of events for a 2-col projection must not
    # read all 6 columns
    if name == "stable_order":
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        if m and len(m.group(1).split(",")) > 3:
            problems.append(f"scan reads too many columns: {m.group(1)}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])  # optional query-name filter
    spark = get_spark(master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    failed = []
    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        try:
            plan = plan_of(fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL  {name}: {type(exc).__name__}: {exc}")
            continue
        problems = check(name, plan)
        if problems:
            failed.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"ok    {name}")
    print(f"\n{len(failed)} plan violations" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
