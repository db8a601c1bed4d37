"""Connected components over an edge list — the pairs→clusters step of
near-dup deduplication.

The reference engine has no graph surface (its whole query capability is
count-by-key, `/root/reference/src/worker.rs:23-38`); this is an
[extension] operator: MinHash/SimHash/Jaccard emit near-dup PAIRS, but a
dedup pipeline needs CLUSTERS (keep one survivor per group of mutually-
similar documents, where similarity is transitively closed).

Algorithm: iterative min-label propagation, expressed as DataFrame ops —
each round every node adopts the minimum label among itself and its
neighbours; at convergence every node carries the minimum node id of its
component (a deterministic, engine-independent cluster id).

Scale design:
- one hash shuffle per round (the union+groupBy on node); the edge list
  is re-used as-is, so edges shuffle once per round but never grow.
- rounds = graph diameter.  Dedup-similarity graphs are overwhelmingly
  tiny dense clusters (diameter ≤ 3-4), so propagation converges in a
  handful of rounds; for adversarially long chains at planetary scale,
  the Kiveris et al. "Connected Components in MapReduce" (2014)
  large-star/small-star alternation bounds rounds at O(log n) with the
  same per-round shuffle shape — the hook point is this same loop body.
- convergence is detected with a one-row aggregate per round: labels
  only ever DECREASE, so the global SUM(label) is strictly monotone and
  stalls exactly at the fixed point — no expensive old-vs-new anti-join.
- `localCheckpoint` truncates the lineage each round so the plan (and
  driver memory) stays O(1) in the number of iterations instead of
  growing a nested-union tree Catalyst would re-optimize every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the
    minimum node id reachable from it.

    Returns a DataFrame (node: long, component: long) covering every
    node that appears in at least one edge.  Deterministic: the
    component id is the component's minimum node id, independent of
    partitioning, iteration count, or engine.

    Raises ``RuntimeError`` if ``max_iter`` rounds don't converge
    (diameter > max_iter) rather than silently returning a partial
    clustering.
    """
    sym = (
        edges.select(
            F.col(src).cast("long").alias("node"),
            F.col(dst).cast("long").alias("nbr"),
        )
        .union(
            edges.select(
                F.col(dst).cast("long").alias("node"),
                F.col(src).cast("long").alias("nbr"),
            )
        )
        .localCheckpoint()
    )
    labels = (
        sym.select("node").distinct().withColumn("lbl", F.col("node"))
    ).localCheckpoint()
    prev_sum = labels.agg(F.sum(F.col("lbl").cast("decimal(38,0)"))).collect()[
        0
    ][0]
    for _ in range(max_iter):
        msgs = sym.join(labels, "node").select(
            F.col("nbr").alias("node"), "lbl"
        )
        labels = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
        ).localCheckpoint()
        cur_sum = labels.agg(
            F.sum(F.col("lbl").cast("decimal(38,0)"))
        ).collect()[0][0]
        if cur_sum == prev_sum:
            return labels.select("node", F.col("lbl").alias("component"))
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components: no convergence in {max_iter} rounds "
        "(graph diameter exceeds max_iter)"
    )


def cluster_stats(components: DataFrame) -> DataFrame:
    """Per-cluster summary of a (node, component) assignment: size and
    the sorted member list (deterministic columns for oracle hashing)."""
    return (
        components.groupBy("component")
        .agg(
            F.count("*").alias("n_docs"),
            F.sort_array(F.collect_list("node")).alias("members"),
        )
        .orderBy("component")
    )
