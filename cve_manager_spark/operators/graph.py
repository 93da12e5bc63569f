"""Connected components over an edge DataFrame — the clustering step of
a dedup pipeline (near-dup PAIRS → duplicate GROUPS → keep one per group).

Algorithm: iterative min-label propagation with pointer jumping.
Each round does two distributed steps:

1. neighbor-min: every node takes the minimum label among itself and its
   neighbors (one join + hash aggregate on the edge relation);
2. pointer jumping: every node replaces its label with its label's label
   (one self-join on the label relation) — this halves path lengths, so
   chains of length L converge in O(log L) rounds instead of O(L).

Per-round lineage is truncated with localCheckpoint (an iterative
algorithm otherwise accretes an unexecutable plan). The driver loop only
counts rounds and checks convergence (one scalar count per round); all
data movement is executor-side joins keyed on node id.

This is the driver-loop shape of Kiveris et al.'s "Connected Components
in MapReduce and Beyond" two-phase algorithms, simplified: good to
O(log n) rounds, each a shuffle linear in |E|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) with component = min node id in the component.

    Deterministic: min-label is order-independent. Raises if not converged
    within max_iter (2**25 ≈ 33M-hop chains — unreachable in practice).
    """
    undirected = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    undirected = undirected.localCheckpoint(eager=True)

    labels = (
        undirected.select("u").distinct().select(F.col("u").alias("node"), F.col("u").alias("label"))
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        neighbor_min = (
            undirected.join(labels, undirected.v == labels.node)
            .groupBy("u")
            .agg(F.min("label").alias("nmin"))
        )
        stepped = (
            labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nmin", F.col("label"))).alias("label"),
            )
        )
        # pointer jumping: label <- label(label)
        parent = stepped.select(
            F.col("node").alias("p_node"), F.col("label").alias("p_label")
        )
        jumped = (
            stepped.join(parent, stepped.label == parent.p_node, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("p_label", F.col("label"))).alias("label"),
            )
        ).localCheckpoint(eager=True)

        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = jumped
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")


def dedup_keep_one_per_cluster(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """End of the dedup pipeline: collapse near-dup pairs into clusters and
    keep the minimum-id representative of each cluster (singletons — rows
    in no pair — keep themselves)."""
    comp = connected_components(pairs)
    return (
        df.join(comp, df[id_col] == comp.node, "left")
        .withColumn("cluster", F.coalesce("component", F.col(id_col)))
        .where(F.col(id_col) == F.col("cluster"))
        .drop("node", "component", "cluster")
    )
