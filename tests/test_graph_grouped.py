"""Connected-components clustering and grouped-pandas operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.grouped_pandas import (
    grouped_percent_rank,
)


def test_connected_components_chain_and_islands(spark):
    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], ["id"])
    # chain 1-2-3-4 (diameter 3, forces multiple rounds), pair 5-6, island 7
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6)], ["src", "dst"]
    )
    out = {r.node: r.cluster_id for r in connected_components(nodes, edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7}


def test_connected_components_deep_chain(spark):
    # diameter 120 >> any plain-round budget: exercises the adaptive
    # pointer jump AND the per-round lineage truncation (without the
    # localCheckpoint cut, the ~4^rounds logical plan OOMs the driver
    # long before data size matters)
    n = 120
    nodes = spark.range(n).select(F.col("id"))
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["src", "dst"])
    out = {r.node: r.cluster_id for r in connected_components(nodes, edges).collect()}
    assert len(out) == n
    assert set(out.values()) == {0}


def test_connected_components_raises_when_unconverged(spark):
    # jump disabled + tiny round budget on a deep chain: must raise,
    # never return a partially-propagated labeling
    nodes = spark.range(40)
    edges = spark.createDataFrame([(i, i + 1) for i in range(39)], ["src", "dst"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, edges, max_iterations=3, jump_after=99).collect()


def test_dedup_clusters_representatives(spark):
    docs = spark.createDataFrame([(i,) for i in [10, 20, 30, 40]], ["doc_id"])
    pairs = spark.createDataFrame([(20, 30), (30, 40)], ["d1", "d2"])
    rows = {r.doc_id: r for r in dedup_clusters(docs, pairs).collect()}
    assert rows[10].cluster_id == 10 and rows[10].is_representative
    assert rows[20].cluster_id == 20 and rows[20].is_representative
    assert rows[30].cluster_id == 20 and not rows[30].is_representative
    assert rows[40].cluster_id == 20 and not rows[40].is_representative
    keep = [d for d, r in rows.items() if r.is_representative]
    assert sorted(keep) == [10, 20]  # one survivor per cluster


def test_grouped_percent_rank_sql_semantics(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "a", 20), (4, "a", 30), (5, "b", 7)],
        ["doc_id", "source", "n_chars"],
    )
    out = {r.doc_id: r.pct_rank for r in grouped_percent_rank(df, "source", "n_chars", "doc_id").collect()}
    # ties share min-rank; single-row group → 0
    assert out[1] == 0.0
    assert out[2] == out[3] == round(1 / 3, 6)
    assert out[4] == 1.0
    assert out[5] == 0.0


def test_blocked_components_matches_iterative_cc(spark):
    from pyspark.sql import Row

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.graph import (
        blocked_components,
        connected_components,
    )

    # two blocks; block 0 has a chain 1-2-3 plus isolated 4,
    # block 1 has a pair 10-11 plus isolated 12
    nodes = spark.createDataFrame(
        [Row(blk=0, id=i) for i in (1, 2, 3, 4)]
        + [Row(blk=1, id=i) for i in (10, 11, 12)]
    )
    edges = spark.createDataFrame(
        [Row(blk=0, src=1, dst=2), Row(blk=0, src=2, dst=3), Row(blk=1, src=10, dst=11)]
    )
    got = {
        r["node"]: r["cluster_id"]
        for r in blocked_components(nodes, edges, "blk").collect()
    }
    want = {
        r["node"]: r["cluster_id"]
        for r in connected_components(
            nodes.select("id"), edges.select("src", "dst")
        ).collect()
    }
    assert got == want == {1: 1, 2: 1, 3: 1, 4: 4, 10: 10, 11: 10, 12: 12}


def test_blocked_components_union_order_independent(spark):
    from pyspark.sql import Row

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.graph import (
        blocked_components,
    )

    nodes = spark.createDataFrame([Row(blk=0, id=i) for i in range(8)])
    # star centered on 7 (max id): min-label must still be 0's component min
    edges_fwd = spark.createDataFrame([Row(blk=0, src=7, dst=i) for i in range(7)])
    edges_rev = spark.createDataFrame([Row(blk=0, src=i, dst=7) for i in range(7)])
    a = sorted(blocked_components(nodes, edges_fwd, "blk").collect())
    b = sorted(blocked_components(nodes, edges_rev, "blk").collect())
    assert a == b
    assert all(r["cluster_id"] == 0 for r in a)


def test_partitioned_components_matches_iterative_cc_random(spark):
    import random

    from pyspark.sql import Row

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.graph import (
        connected_components,
        partitioned_components,
    )

    rng = random.Random(42)
    n = 120
    # random sparse graph: chains, triangles, isolated nodes — edges
    # land in arbitrary hash blocks, so cross-block chaining is the norm
    edges = [
        Row(src=rng.randrange(n), dst=rng.randrange(n)) for _ in range(90)
    ]
    edges = [e for e in edges if e.src != e.dst]
    nodes = spark.createDataFrame([Row(id=i) for i in range(n)])
    edf = spark.createDataFrame(edges)
    got = {
        r["node"]: r["cluster_id"]
        for r in partitioned_components(nodes, edf, num_blocks=8).collect()
    }
    want = {
        r["node"]: r["cluster_id"]
        for r in connected_components(nodes, edf).collect()
    }
    assert got == want


def test_partitioned_components_cross_block_chain(spark):
    from pyspark.sql import Row

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.graph import (
        partitioned_components,
    )

    # a long chain guarantees edges scatter across hash blocks; the
    # contraction step must still stitch one component (this is exactly
    # the case a per-band blocked union-find would get wrong)
    nodes = spark.createDataFrame([Row(id=i) for i in range(64)])
    edges = spark.createDataFrame([Row(src=i, dst=i + 1) for i in range(63)])
    out = partitioned_components(nodes, edges, num_blocks=16).collect()
    assert all(r["cluster_id"] == 0 for r in out)
    assert len(out) == 64


def test_partitioned_components_iterative_fallback_past_bound(spark):
    from pyspark.sql import Row

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.graph import (
        connected_components,
        partitioned_components,
    )

    # contracted_edge_bound=0 forces every contracted-label edge past
    # the single-task budget → the iterative-propagation fallback must
    # run and produce identical labels (the cluster-scale escape hatch
    # for a pathologically weak contraction)
    nodes = spark.createDataFrame([Row(id=i) for i in range(40)])
    edges = spark.createDataFrame(
        [Row(src=i, dst=i + 1) for i in range(29)]  # chain 0..29, 10 isolated
    )
    got = {
        r["node"]: r["cluster_id"]
        for r in partitioned_components(
            nodes, edges, num_blocks=8, contracted_edge_bound=0
        ).collect()
    }
    want = {
        r["node"]: r["cluster_id"]
        for r in connected_components(nodes, edges).collect()
    }
    assert got == want
    assert got[0] == 0 and got[29] == 0 and got[39] == 39
