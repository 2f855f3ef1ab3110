"""Iterative graph algorithms beyond connected components.

:func:`pagerank` — fixed-iteration PageRank with the same
determinism discipline as ``similarity.kmeans_centroids`` and
``dedup.connected_components``:

* per-edge contributions ``rank/out_degree`` are computed in double
  (identical IEEE ops in any engine) and CAST TO DECIMAL(27,12)
  before the sum, so partial-agg order cannot change the result;
* each iteration's ranks are rounded to 12dp doubles, so iteration
  i+1 starts from bit-identical inputs cross-engine;
* the rank frame is ``localCheckpoint``-ed per iteration — the
  iterative-plan rule (lineage re-analysis goes superlinear in
  iterations otherwise, measured on connected_components).

Simplifications vs "full" PageRank, stated up front: iteration count
is fixed (no convergence test — convergence checks on doubles are the
cross-engine flake this repo avoids), and dangling-node mass is NOT
redistributed (feed an undirected edge set — the default — and no
node dangles). That is the variant an external engine can replay
bit-for-bit, which is what the oracle gate checks.

Scale shape: per iteration, one equi-join of edges->ranks (edges
pre-partitioned by src would co-locate it), one partial-agg shuffle
keyed by dst. Skewed hubs are exactly the salted-agg case —
contributions are a commutative decimal sum, so
``operators/salted.py`` applies verbatim if a hub dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    undirected: bool = True,
) -> DataFrame:
    """Fixed-iteration deterministic PageRank.

    Returns ``(node, rank)`` over every node that appears in the edge
    set. ``undirected=True`` (default) mirrors every edge so the walk
    is symmetric and no node dangles.
    """
    e = edges.select(
        F.col(src).cast("string").alias("src"), F.col(dst).cast("string").alias("dst")
    ).filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    if undirected:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.distinct().localCheckpoint(eager=True)
    # nodes = src UNION dst: in directed mode a sink that never emits
    # still receives mass and must get a rank row
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__d"))
    teleport = (1.0 - damping) / n
    ranks = nodes.withColumn("r", F.lit(1.0 / n))
    for _ in range(iters):
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("r") / F.col("__d")).cast("decimal(27,12)").alias("__c"),
            )
        )
        sums = contrib.groupBy("node").agg(F.sum("__c").alias("__c"))
        ranks = (
            nodes.join(sums, "node", "left")
            .select(
                "node",
                F.round(
                    F.lit(teleport)
                    + F.lit(damping)
                    * F.coalesce(F.col("__c").cast("double"), F.lit(0.0)),
                    12,
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.col("r").alias("pagerank"))
