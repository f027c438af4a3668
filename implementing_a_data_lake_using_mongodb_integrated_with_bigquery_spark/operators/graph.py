"""Connected components over a pair list — dedup-cluster resolution.

A dedup pipeline doesn't end at pairs: (a,b), (b,c) must collapse to
ONE cluster {a,b,c} with one kept representative. That's connected
components on the similarity graph. Implementation is iterative
label propagation (each node adopts the min label among itself and
its neighbors) — the standard MapReduce CC algorithm; rounds ≈ graph
diameter (near-dup clusters are shallow, typically 2-4 rounds).

Each round is one join + one min-aggregation, all set-oriented; the
driver only checks the convergence counter. At 100 TB-scale graphs,
swap in large-star/small-star (fewer rounds on high-diameter graphs) —
same primitive ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """(node, cluster_id) where cluster_id = min node id reachable in
    the undirected graph. Isolated nodes are their own cluster."""
    # cache the undirected edge list: it joins into EVERY round, and its
    # lineage may be an expensive pipeline (e.g. the similarity join)
    both = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        .distinct()
        .cache()
    )
    all_nodes = nodes.select(F.col(node_col).alias("node"))
    # nodes touching no edge are trivially their own cluster — iterate
    # only the edge-incident subgraph (usually a small fraction of the
    # corpus in dedup workloads) and union the identity rows back in
    touched = both.select(F.col("a").alias("node")).distinct().cache()
    isolated = all_nodes.join(touched, "node", "left_anti")
    labels = touched.select("node", F.col("node").alias("label")).cache()
    for _ in range(max_iterations):
        # one round = neighbor-min aggregation + left join back to the
        # old labels, with the convergence flag embedded — a single
        # cached plan serves both the changed-count action and the next
        # round (no separate comparison join)
        neighbor_min = (
            both.join(labels, both["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("nmin"))
        )
        stepped = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias("label"),
                (F.coalesce(F.col("nmin"), F.col("label")) < F.col("label")).alias("_changed"),
            )
            .cache()
        )
        changed = stepped.filter(F.col("_changed")).count()
        labels.unpersist()
        labels = stepped.drop("_changed")
        if changed == 0:
            break
    else:
        # exhausting the iteration budget with labels still moving means
        # the returned clustering is WRONG (partially propagated) — fail
        # loudly instead of letting it masquerade as a valid result
        raise RuntimeError(
            f"connected_components did not converge within {max_iterations} "
            f"iterations ({changed} labels still changing); raise "
            "max_iterations or switch to large-star/small-star"
        )
    return labels.unionByName(
        isolated.select("node", F.col("node").alias("label"))
    ).select(F.col("node"), F.col("label").alias("cluster_id"))


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_cols: tuple[str, str] = ("d1", "d2"),
) -> DataFrame:
    """Resolve near-dup pairs into clusters: every document labeled
    with its cluster representative (min doc id in the component);
    ``is_representative`` marks the one row to KEEP per cluster."""
    cc = connected_components(
        docs.select(id_col), pairs, node_col=id_col,
        src_col=pair_cols[0], dst_col=pair_cols[1],
    )
    return cc.select(
        F.col("node").alias(id_col),
        "cluster_id",
        (F.col("node") == F.col("cluster_id")).alias("is_representative"),
    )
