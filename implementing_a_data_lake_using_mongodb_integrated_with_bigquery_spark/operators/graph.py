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


def partitioned_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    num_blocks: int = 32,
    contracted_edge_bound: int = 5_000_000,
) -> DataFrame:
    """Connected components via partition-local contraction: same
    output contract as :func:`connected_components` (cluster_id = min
    node id in the component), but the iterative propagation runs only
    on a CONTRACTED graph.

    Why not per-band blocked union-find? Candidate pairs from LSH bands
    are band-internal, but COMPONENTS are not: pair (a,b) from band 1
    and (b,c) from band 5 chain into one cluster across bands, so
    resolving each band independently (``blocked_components``) would
    split real clusters. The correct one-pass trick is contraction
    (Kiveris et al., "Connected Components in MapReduce and Beyond"):

    1. hash-partition EDGES into ``num_blocks`` blocks; union-find each
       block in memory → every edge endpoint gets a block-local label
       (the min node id of its block-local component). One shuffle.
    2. a node landing in several blocks got several labels — all its
       labels belong to one real component, so emit label-graph edges
       (min label ↔ other labels). One agg. The label graph has one
       node per block-local component: for near-dup workloads this is
       orders of magnitude smaller than the doc graph.
    3. run the iterative :func:`connected_components` on the contracted
       label graph (usually converges in 1-2 tiny rounds), then join
       the final labels back down to nodes. Because every label is
       itself a node id and min is transitive, the contracted min IS
       the global min node id.

    Net: the O(rounds) joins over the full edge set become one shuffle
    + one agg + O(rounds) joins over the contracted graph — the 100 TB
    shape for shallow near-dup graphs, without the band-split bug.
    """
    import pandas as pd

    e = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).withColumn("_blk", F.pmod(F.xxhash64("a"), F.lit(num_blocks)))

    def resolve(pdf: pd.DataFrame) -> pd.DataFrame:
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        for a, b in zip(pdf["a"].tolist(), pdf["b"].tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        seen = set(pdf["a"].tolist()) | set(pdf["b"].tolist())
        comp_min: dict = {}
        for x in seen:
            r = find(x)
            comp_min[r] = min(comp_min.get(r, x), x)
        ids = sorted(seen)
        return pd.DataFrame(
            {"node": ids, "label": [comp_min[find(x)] for x in ids]}
        )

    node_t = nodes.schema[node_col].dataType.simpleString()
    # materialize ONCE and cut lineage: everything below fans out into
    # several consumers, and the upstream edge pipeline (a similarity
    # join, typically) must not re-execute per consumer
    local = (
        e.groupBy("_blk")
        .applyInPandas(resolve, f"node {node_t}, label {node_t}")
        .localCheckpoint(eager=True)
    )
    # a node with labels {L1..Lk} across blocks proves L1..Lk are one
    # component: star-connect them through the node's min label.
    # bounded buffer: the collect_set holds one label per BLOCK the
    # node appears in (≤ bands/cells per node, a parameter constant)
    per_node = local.groupBy("node").agg(
        F.min("label").alias("lmin"), F.collect_set("label").alias("labels")
    ).localCheckpoint(eager=True)
    label_edges = per_node.select(
        F.col("lmin").alias("src"), F.explode("labels").alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    # the contracted graph has one node per BLOCK-SPANNING local
    # component — orders of magnitude smaller than the edge set. Up to
    # a generous bound, one union-find task resolves it (same
    # single-task rationale as the bounded quantizer sample); past the
    # bound, fall back to the iterative propagation, which handles any
    # size. Either way the full edge set is never re-shuffled.
    n_label_edges = label_edges.count()
    if n_label_edges == 0:
        edge_incident = per_node.select("node", F.col("lmin").alias("cluster_id"))
    elif n_label_edges <= contracted_edge_bound:
        contracted = blocked_components(
            label_edges.select(F.explode(F.array("src", "dst")).alias("lnode"))
            .distinct()
            .withColumn("_b", F.lit(0)),
            label_edges.withColumn("_b", F.lit(0)),
            "_b",
            node_col="lnode",
        ).select(F.col("node").alias("lmin"), F.col("cluster_id"))
        edge_incident = per_node.join(contracted, "lmin", "left").select(
            "node", F.coalesce("cluster_id", "lmin").alias("cluster_id")
        )
    else:
        label_nodes = local.select(F.col("label").alias("lnode")).distinct()
        contracted = connected_components(
            label_nodes, label_edges, node_col="lnode"
        ).select(F.col("node").alias("lmin"), F.col("cluster_id"))
        edge_incident = per_node.join(contracted, "lmin").select(
            "node", "cluster_id"
        )
    # materialize ONCE: edge_incident feeds BOTH the union's main
    # branch and isolated's anti-join — without the checkpoint the
    # whole label-resolution subplan executes twice and downstream
    # aggregations re-shuffle the tiny label structures per consumer
    # (dedup_cluster_stats audit: 8 shuffles -> 2)
    edge_incident = edge_incident.localCheckpoint(eager=True)
    isolated = (
        nodes.select(F.col(node_col).alias("node"))
        .join(edge_incident.select("node"), "node", "left_anti")
        .select("node", F.col("node").alias("cluster_id"))
    )
    return edge_incident.unionByName(isolated)


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_cols: tuple[str, str] = ("d1", "d2"),
) -> DataFrame:
    """Resolve near-dup pairs into clusters: every document labeled
    with its cluster representative (min doc id in the component);
    ``is_representative`` marks the one row to KEEP per cluster.

    Routed through :func:`partitioned_components` (round 4): the
    iterative propagation now runs on the contracted label graph only
    — identical labels (parity-tested against
    :func:`connected_components`), one full-edge shuffle instead of
    O(rounds)."""
    cc = partitioned_components(
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


def triangle_count(edges: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    """Exact triangle count of an undirected graph given as a pair
    list (self-loops dropped, duplicates and direction collapsed), via
    DEGREE-ORDERED edge orientation — the standard skew-proof
    distributed algorithm (Suri & Vassilvitskii, "Counting Triangles
    and the Curse of the Last Reducer", WWW'11).

    Each undirected edge is oriented from its lower to its higher
    endpoint in the (degree, id) total order, so every node's
    out-degree is bounded by O(√|E|) regardless of hubs; the wedge
    self-join on the source then generates Σ C(outdeg, 2) candidates
    instead of Σ C(deg, 2) — the difference between bounded work and a
    quadratic blowup on a hub node at 100 TB. Each triangle is
    enumerated exactly once (its (deg, id)-minimum vertex is the only
    wedge apex whose closing edge exists in the orientation).

    Returns one row: n_nodes, n_edges, n_triangles (all bigint).
    Plan: canonicalize (1 shuffle), degree decoration via one
    map-side-combined aggregate over the directed copies (|V| rows
    out) joined back onto each endpoint — the r12 rewrite: the former
    window-count decoration shuffled AND sorted all 2|E| directed rows
    then regrouped another 2|E| by the canonical pair, where the
    degree table costs one combinable agg and two planner-sized joins
    (broadcast while |V| is small, shuffle at scale) — then one wedge
    self-join co-partitioned on src and one closing equi-join on
    (v, w). All key-partitioned, nothing driver-side.
    """
    e = edges.select(F.col(src_col).alias("x"), F.col(dst_col).alias("y")).where(
        F.col("x") != F.col("y")
    )
    # canon feeds four consumers (two degree joins, edge count, degree
    # agg) and oriented feeds three (both wedge sides + the closing
    # join): materialize each ONCE so the dedup/decorate work isn't
    # re-executed per consumer (the 2a9cd5e curation-composite lesson)
    canon = (
        e.select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # |V|-row degree table, pinned once: it feeds two join branches and
    # the node count — NO broadcast hint (|V| is data-proportional; the
    # planner broadcasts it while small and shuffles at scale, per the
    # r11 hint policy)
    deg = (
        canon.select(F.col("a").alias("n"))
        .unionAll(canon.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("_deg"))
        .localCheckpoint(eager=True)
    )
    withdeg = canon.join(
        deg.select(F.col("n").alias("a"), F.col("_deg").alias("da")), "a"
    ).join(deg.select(F.col("n").alias("b"), F.col("_deg").alias("db")), "b")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = withdeg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dst_deg"),
    ).localCheckpoint(eager=True)
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    v_before_w = (F.col("o1.dst_deg") < F.col("o2.dst_deg")) | (
        (F.col("o1.dst_deg") == F.col("o2.dst_deg"))
        & (F.col("o1.dst") < F.col("o2.dst"))
    )
    wedges = o1.join(o2, (F.col("o1.src") == F.col("o2.src")) & v_before_w).select(
        F.col("o1.dst").alias("v"), F.col("o2.dst").alias("w")
    )
    # shuffle-hash hint on the closing side (r14, guide §3.1): the
    # sort-merge default SORTS the Σ C(outdeg,2) wedge stream — the
    # dominant cost of the whole census (16M rows / 386MB at sf0.1) —
    # to match an edge build side that is orders of magnitude smaller.
    # The hash build is PARTITION-LOCAL (|E|/P rows, with P sized by
    # AQE coalescing against the dominant wedge side, so the build's
    # per-partition share stays far under the partition size target at
    # any scale) and the (v, w) keys are unique edges — no hot key can
    # concentrate the build. This is not the banned broadcast-hint
    # class (whole-relation, size-unbounded); measured: the global
    # AQE SHJ-rewrite conf gave the same plan and
    # local_clustering_topk 7.7→5.7s / copurchase_triangles 6.5→5.2s,
    # but regressed small-join queries ~10-15% session-wide, so the
    # conversion is pinned HERE only.
    closing = oriented.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tri = wedges.join(closing.hint("shuffle_hash"), ["v", "w"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
    counts = canon.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
    ).crossJoin(deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes")))
    return counts.crossJoin(tri).select("n_nodes", "n_edges", "n_triangles")


def kcore_peel(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    k: int,
    rounds: int,
) -> DataFrame:
    """Bounded k-core peeling: iteratively remove nodes of degree < k
    (and their edges) for exactly ``rounds`` rounds, returning the
    surviving nodes with their within-subgraph degree.

    The k-core is the fixpoint of this peel; a FIXED round count keeps
    the computation replayable on any engine (the oracle unrolls the
    same rounds as chained CTEs — same discipline as the bounded
    PageRank iterations in this module). Callers wanting the exact
    core run rounds until an extra round is a no-op.

    Scale shape per round: one degree aggregate over the live edge set
    (map-side combined) + two semi-joins of the edge table against the
    alive-node set — alive is at most |V| rows, so AQE broadcasts it
    in practice; every stage is keyed, nothing driver-side. Lineage is
    cut per round with an eager localCheckpoint (module convention —
    iterative plans double per round otherwise and OOM the driver
    during analysis).

    Self-loops are dropped and direction/duplicates collapsed up
    front, as in ``triangle_count``.
    """
    if k < 1 or rounds < 1:
        raise ValueError("k and rounds must be >= 1")
    e = (
        edges.select(
            F.least(src_col, dst_col).alias("a"),
            F.greatest(src_col, dst_col).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        deg = (
            e.select(F.col("a").alias("n"))
            .unionAll(e.select(F.col("b").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("_deg"))
        )
        alive = deg.where(F.col("_deg") >= k).select("n")
        e = (
            e.join(alive.select(F.col("n").alias("a")), "a", "left_semi")
            .join(alive.select(F.col("n").alias("b")), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    return (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
    )


def per_vertex_triangles(
    edges: DataFrame, src_col: str, dst_col: str
) -> DataFrame:
    """Per-vertex triangle counts via the same degree-ordered
    orientation as :func:`triangle_count` (each triangle enumerated
    exactly once at its (deg, id)-minimum apex), but the apex rides
    the wedge so every closed triangle credits ALL THREE corners with
    one ``posexplode``-free array explode — the input to local
    clustering coefficients (cᵥ = 2·Tᵥ / (degᵥ·(degᵥ−1))), the
    per-node community-density signal a recsys/GNN feature pipeline
    wants where the global census (`triangle_count`) gives one number.
    Same skew bound: out-degree ≤ O(√|E|), so wedge generation never
    quadratic on hubs. Degree decoration is the r12 agg+join shape
    (see :func:`triangle_count`): one map-side-combined degree
    aggregate (|V| rows, pinned once — it feeds two join branches and
    the final degree column) instead of a 2|E| window sort + 2|E|
    regroup. Returns (node, degree, n_triangles) for every node of
    the deduplicated undirected graph."""
    e = edges.select(F.col(src_col).alias("x"), F.col(dst_col).alias("y")).where(
        F.col("x") != F.col("y")
    )
    canon = (
        e.select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        canon.select(F.col("a").alias("n"))
        .unionAll(canon.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("_deg"))
        .localCheckpoint(eager=True)
    )
    withdeg = canon.join(
        deg.select(F.col("n").alias("a"), F.col("_deg").alias("da")), "a"
    ).join(deg.select(F.col("n").alias("b"), F.col("_deg").alias("db")), "b")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = withdeg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dst_deg"),
    ).localCheckpoint(eager=True)
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    v_before_w = (F.col("o1.dst_deg") < F.col("o2.dst_deg")) | (
        (F.col("o1.dst_deg") == F.col("o2.dst_deg"))
        & (F.col("o1.dst") < F.col("o2.dst"))
    )
    wedges = o1.join(o2, (F.col("o1.src") == F.col("o2.src")) & v_before_w).select(
        F.col("o1.src").alias("apex"),
        F.col("o1.dst").alias("v"),
        F.col("o2.dst").alias("w"),
    )
    # shuffle-hash hint on the closing side — same reasoning and
    # measurement as triangle_count: never sort the wedge stream
    closing = oriented.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tri_corners = (
        wedges.join(closing.hint("shuffle_hash"), ["v", "w"])
        .select(
            F.explode(F.array(F.col("apex"), F.col("v"), F.col("w"))).alias(
                "node"
            )
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    degrees = deg.select(
        F.col("n").alias("node"), F.col("_deg").cast("long").alias("degree")
    )
    return degrees.join(tri_corners, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias(
            "n_triangles"
        ),
    )
