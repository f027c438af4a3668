"""Connected components over a pair list — dedup-cluster resolution.

A dedup pipeline doesn't end at pairs: (a,b), (b,c) must collapse to
ONE cluster {a,b,c} with one kept representative. That's connected
components on the similarity graph. Implementation is iterative
min-label propagation (each node adopts the min label among itself
and its neighbors — the standard MapReduce CC round), with POINTER
JUMPING (adopt my label's label, halving chain depth per round)
enabled adaptively when the graph turns out to be deep.

Near-dup clusters are shallow (diameter 2-4): plain rounds converge
immediately and the jump join would only add cost — measured 3× per
round at bench scale for zero saved rounds. A pathological chain
graph, however, needs O(diameter) plain rounds; so after
``jump_after`` unconverged rounds the jump switches on and the
remaining convergence is O(log diameter). Worst case round count is
jump_after + O(log d) — 25 iterations covers diameters beyond 2²⁰.

Scale discipline: the iteration runs only over the edge-incident
subgraph (isolated nodes union back at the end); the per-round state
is (node, label) pairs only; and each round's labels are eagerly
local-checkpointed, which BOTH materializes them for the convergence
count AND truncates lineage. The truncation is load-bearing, not
hygiene: a round's plan references the previous labels twice (the
self-join with its own neighbor-min) so an uncut logical plan grows
~2^rounds (4^rounds with the jump) and OOMs the DRIVER during
analysis long before any data-size limit — caching alone does not
help because Catalyst re-analyzes the full tree every round.
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
    jump_after: int = 4,
) -> DataFrame:
    """(node, cluster_id) where cluster_id = min node id reachable in
    the undirected graph. Isolated nodes are their own cluster.

    Raises if label propagation has not converged within
    ``max_iterations`` rounds — a partially-propagated labeling must
    never masquerade as a valid clustering.
    """
    # cache the directed edge input FIRST: the undirected view below
    # references it twice (self-union), and without the cache an
    # expensive edge pipeline (e.g. the similarity join) would execute
    # once per union branch
    edges_c = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).cache()
    both = (
        edges_c.union(edges_c.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .cache()
    )
    all_nodes = nodes.select(F.col(node_col).alias("node"))
    # nodes touching no edge are trivially their own cluster — iterate
    # only the edge-incident subgraph and union the identity rows in
    touched = both.select(F.col("a").alias("node")).distinct().cache()
    isolated = all_nodes.join(touched, "node", "left_anti")
    labels = touched.select("node", F.col("node").alias("label"))
    changed = 0
    for i in range(max_iterations):
        # one round = neighbor-min aggregation + left join back onto the
        # old labels; the convergence flag rides the same materialized
        # output as the next round's input (no separate comparison join)
        neighbor_min = (
            both.join(labels, both["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("nmin"))
        )
        stepped = labels.join(neighbor_min, "node", "left").select(
            "node",
            F.col("label").alias("label0"),
            F.least(F.col("label"), F.coalesce("nmin", "label")).alias("label1"),
        )
        if i >= jump_after:
            # deep graph: add the pointer jump so remaining label chains
            # halve every round (labels only decrease, so the jump is
            # always an improvement or a no-op). stepped feeds both join
            # sides — checkpoint it so it's computed once and the plan
            # tree doesn't double
            stepped = stepped.localCheckpoint(eager=True)
            lookup = stepped.select(
                F.col("node").alias("tnode"), F.col("label1").alias("tlabel")
            )
            new_label = F.least(F.col("label1"), F.coalesce("tlabel", "label1"))
            out = stepped.join(
                lookup, stepped["label1"] == lookup["tnode"], "left"
            ).select(
                "node",
                new_label.alias("label"),
                (new_label < F.col("label0")).alias("_changed"),
            )
        else:
            out = stepped.select(
                "node",
                F.col("label1").alias("label"),
                (F.col("label1") < F.col("label0")).alias("_changed"),
            )
        # eager checkpoint = materialize + CUT LINEAGE (see module doc);
        # the convergence count below then reads the materialized blocks
        out = out.localCheckpoint(eager=True)
        changed = out.filter(F.col("_changed")).count()
        labels = out.drop("_changed")
        if changed == 0:
            break
    else:
        # exhausting the iteration budget with labels still moving means
        # the returned clustering is WRONG (partially propagated) — fail
        # loudly instead of letting it masquerade as a valid result
        raise RuntimeError(
            f"connected_components did not converge within {max_iterations} "
            f"iterations ({changed} labels still changing); raise "
            "max_iterations"
        )
    result = labels.unionByName(
        isolated.select("node", F.col("node").alias("label"))
    ).select(F.col("node"), F.col("label").alias("cluster_id"))
    # labels is already checkpointed; only the edge-side caches need
    # releasing (isolated's anti-join re-reads touched lazily, so
    # materialize the result first)
    result = result.localCheckpoint(eager=True)
    touched.unpersist()
    both.unpersist()
    edges_c.unpersist()
    return result


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


def blocked_components(
    nodes: DataFrame,
    edges: DataFrame,
    block_col: str,
    node_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, cluster_id) when every edge is INTERNAL to a blocking key
    (LSH band, IVF cell, coarse cluster — the usual near-dup layout):
    components cannot span blocks, so resolve each block independently
    with an in-memory union-find via a cogrouped ``applyInPandas``.

    ONE shuffle each for nodes and edges (co-partitioned by block)
    replaces the O(rounds) iterative joins of
    :func:`connected_components` — the right trade whenever the
    blocking key bounds the group size (a block must fit one task,
    which candidate-generation already guarantees, or its pair list
    would have been quadratic). Labels match ``connected_components``
    exactly: cluster_id = min node id in the component.

    ``nodes`` must carry ``(block_col, node_col)``; ``edges``
    ``(block_col, src_col, dst_col)``.
    """
    import pandas as pd

    def resolve(n: pd.DataFrame, e: pd.DataFrame) -> pd.DataFrame:
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                # orient toward the smaller id so min-labels fall out
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra

        ids = n["node"].tolist()
        for a, b in zip(e["src"].tolist(), e["dst"].tolist()):
            union(a, b)
        # second pass: the union order above doesn't guarantee the root
        # IS the min — normalize each component to its min member
        comp_min: dict = {}
        for x in ids:
            r = find(x)
            comp_min[r] = min(comp_min.get(r, x), x)
        return pd.DataFrame(
            {"node": ids, "cluster_id": [comp_min[find(x)] for x in ids]}
        )

    n = nodes.select(F.col(block_col).alias("_blk"), F.col(node_col).alias("node"))
    e = edges.select(
        F.col(block_col).alias("_blk"),
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
    )
    node_t = nodes.schema[node_col].dataType.simpleString()
    return (
        n.groupBy("_blk")
        .cogroup(e.groupBy("_blk"))
        .applyInPandas(resolve, f"node {node_t}, cluster_id {node_t}")
    )
