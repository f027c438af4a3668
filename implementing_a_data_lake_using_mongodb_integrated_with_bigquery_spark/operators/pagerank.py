"""Fixed-iteration integer PageRank over an edge DataFrame.

The canonical iterative-graph-algorithm shape (link analysis over a
customer→supplier purchase graph here; the same loop serves web-graph
quality weighting in crawl curation — PageRank-style scores are a
standard document-prior in public web-corpus pipelines).

Recurrence (damping d = 85/100, N = |nodes|, SCALE = 1e12):

    pr_0(v)     = SCALE // N
    contrib(u→v) = (pr_t(u) * 85) // (100 * outdeg(u))
    pr_{t+1}(v) = (15 * SCALE) // (100 * N) + Σ_{u→v} contrib(u→v)

All arithmetic is exact BIGINT (floor division on non-negative
values): contributions are integers BEFORE they are summed, so the
sum is associative/commutative with no float summation-order hazard —
the DuckDB oracle replays the identical recurrence with chained CTEs
and matches bit-for-bit. (Dangling-node mass is deliberately not
redistributed; the recurrence is still a well-defined fixed number of
exact steps, and both engines implement the same one.)

Scale shape per iteration: one equi-join of the edge table with the
|nodes|-sized rank table on the source key, one aggregation onto the
destination key, one outer join back to the node list — all key-
partitioned shuffles of |edges| / |nodes| rows; no driver-side data.
The rank frame is ``localCheckpoint``-ed each round to cut lineage
(the iterative-loop driver-OOM guard — see ``operators/graph.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, pr_scaled) after ``iterations`` exact integer PageRank
    steps. ``edges`` must be distinct directed (src, dst) pairs."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        # loop-invariant frames are materialized ONCE: without the
        # checkpoint every iteration re-derives the edge list from its
        # upstream plan (scan + join + distinct), multiplying the most
        # expensive stage by the iteration count
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()  # one scalar; the node list itself never collects
    base = (15 * SCALE) // (100 * n_nodes)
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    e_deg = e.join(outdeg, "src").localCheckpoint(eager=True)

    pr = nodes.withColumn("pr", F.lit(SCALE // n_nodes).cast("long"))
    for _ in range(iterations):
        contrib = (
            e_deg.join(pr.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("(pr * 85) div (100 * d)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("m"))
        )
        pr = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce(F.col("m"), F.lit(0)))
                .cast("long")
                .alias("pr"),
            )
            .localCheckpoint(eager=True)  # cut lineage every round
        )
    return pr.select("node", F.col("pr").alias("pr_scaled"))
