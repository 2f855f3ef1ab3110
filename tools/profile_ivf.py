"""Stage-level cost attribution for the two slowest bench queries
(`knn_cosine_ivf`, `pagerank`) at the bench input (sf0.1, local[32]).

The r4 verdict asked for SQ8-quantized probing in `knn_cosine_ivf`
"or a documented measurement showing probe cost isn't the bottleneck".
This script IS that measurement: it times the IVF pipeline's stages —
k-means training, corpus assignment, probe + exact re-rank —
separately (each stage materialized to a noop write so nothing
collects), and prints one JSON line per timing.

Usage: python tools/profile_ivf.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import feat_spark.operators.similarity as S  # noqa: E402
from feat_spark.operators.graph import pagerank  # noqa: E402
from feat_spark.session import get_spark  # noqa: E402


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(label: str, fn, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(json.dumps({"stage": label, "sec": round(best, 3)}))
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = e.count()
    print(json.dumps({"stage": "corpus_rows", "n": n}))

    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    sample = e.filter(F.col("vec_id") < 2000)

    # stage 1: k-means training (2 Lloyd iterations on the 2000-row
    # sample) — returns a collected literal frame, so calling it IS
    # materializing it
    timed("kmeans_train", lambda: S.kmeans_centroids(
        sample, n_centroids=16, iters=2, id_col="vec_id", vec_col="embedding"
    ), reps)

    cents = S.kmeans_centroids(
        sample, n_centroids=16, iters=2, id_col="vec_id", vec_col="embedding"
    )

    # stage 2: corpus assignment only (the literal-fold projection)
    def assign_only():
        c = e.select(F.col("vec_id").alias("neighbor_id"),
                     F.col("embedding").alias("__cv"))
        _noop(S.assign_clusters(
            c, cents, id_col="neighbor_id", vec_col="__cv", out_col="__cid"
        ))
    timed("corpus_assign", assign_only, reps)

    # stage 3: full ivf_topk WITH pre-trained centroids (assignment +
    # probe + exact re-rank; subtracting stage 2 isolates probe+rank)
    timed("ivf_probe_rank_full", lambda: _noop(S.ivf_topk(
        e, queries, k=5, id_col="vec_id", vec_col="embedding",
        n_centroids=16, n_probe=4, centroids=cents,
    )), reps)

    # whole gate as bench times it (train + assign + probe)
    def whole_gate():
        c2 = S.kmeans_centroids(
            sample, n_centroids=16, iters=2, id_col="vec_id", vec_col="embedding"
        )
        _noop(S.ivf_topk(
            e, queries, k=5, id_col="vec_id", vec_col="embedding",
            n_centroids=16, n_probe=4, centroids=c2,
        ))
    timed("gate_total", whole_gate, reps)

    # pagerank at the bench gate's construction (orders x lineitem)
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_custkey"
    )
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey", "l_suppkey"
    )
    edges = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    timed("pagerank_3it", lambda: _noop(pagerank(edges, iters=3, damping=0.85)), reps)


if __name__ == "__main__":
    main()
