"""Plan-shape contracts: broadcasts, pushdown, pruning, codegen.

These pin the physical properties the 100 TB design depends on — a
refactor that silently degrades the plan fails here, not in prod.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.integrity import (
    fk_filter,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.skew import (
    salted_join,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.plans.explain import (
    count_shuffles,
    has_pushed_filter,
    physical_plan,
    scan_read_schema,
    uses_broadcast_join,
    whole_stage_codegen_ids,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.plans.pipeline import (
    star_revenue,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources import (
    load_table,
)


def test_filter_pushdown_reaches_parquet_scan(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 40).select("l_orderkey")
    assert has_pushed_filter(l, "l_quantity")


def test_column_pruning_reads_only_projected_columns(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    cols = scan_read_schema(l)
    assert set(cols) == {"l_orderkey", "l_quantity"}  # 2 of 11 columns read


def test_fk_filter_is_broadcast_semi_join(spark, sf_dir):
    # r11: fk_filter no longer HINTS the broadcast (the key set is
    # data-proportional in general); the contract is that the PLANNER
    # still picks a broadcast semi-join while the key set is small —
    # size-adaptive, not size-blind.
    fact = load_table(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    dim = load_table(spark, sf_dir, "orders")
    assert uses_broadcast_join(fk_filter(fact, dim, "o_orderkey"))


def test_star_revenue_broadcasts_dims_and_uses_codegen(spark, sf_dir):
    df = star_revenue(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )
    assert uses_broadcast_join(df)
    assert whole_stage_codegen_ids(df) >= 1


def test_salted_join_matches_plain_join(spark):
    fact = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", 1)], ["k", "v"]
    )
    dim = spark.createDataFrame([("hot", "H"), ("cold", "C")], ["k", "name"])
    plain = fact.join(dim, "k").groupBy("k", "name").count()
    salted = salted_join(fact, dim, "k", salt_buckets=8).groupBy("k", "name").count()
    assert sorted(map(str, plain.collect())) == sorted(map(str, salted.collect()))


def test_lm_quality_filter_broadcasts_vocab(spark, sf_dir):
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.text import (
        unigram_logprob_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    df = unigram_logprob_scores(docs, vocab_size=100)
    # the K-row vocab table must join onto the exploded tokens as a
    # broadcast — a shuffled vocab join would move the token stream
    assert uses_broadcast_join(df)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan


def test_shard_manifest_is_two_shuffles_max(spark, sf_dir):
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources.layout import (
        shard_assignment,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    tagged = shard_assignment(docs, "doc_id", 16)
    agg = tagged.groupBy("shard_id").count()
    # map-only assignment + one agg shuffle: anything more means the
    # hash expressions stopped being row-local
    assert count_shuffles(agg) <= 1


def test_incremental_dedup_has_no_cartesian(spark, sf_dir):
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.dedup_near import (
        incremental_dedup,
    )

    docs = load_table(spark, sf_dir, "documents")
    df = incremental_dedup(
        docs.filter(F.col("doc_id") % 10 < 8),
        docs.filter(F.col("doc_id") % 10 >= 8),
    )
    plan = physical_plan(df)
    # candidates must come from the band-key equi-join; a cartesian or
    # broadcast nested loop means banding degenerated to all-pairs
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_token_bucket_single_key_shuffle(spark, sf_dir):
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.ratelimit import (
        token_bucket_flags,
    )

    e = load_table(spark, sf_dir, "events")
    df = token_bucket_flags(e)
    # one repartition on the key feeds the sorted scan; no second
    # exchange may appear between the sort and the mapInPandas
    assert count_shuffles(df) == 1


def test_dpp_injects_dynamic_pruning_into_fact_scan(spark, sf_dir):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["dpp_pruned_join"](spark, sf_dir)
    plan = physical_plan(df)
    # the fact scan must carry a runtime DynamicPruning partition
    # filter (directories skipped at execution time, not a static
    # month predicate)
    assert "dynamicpruning" in plan.lower()


def test_hard_negatives_is_equi_join_not_cartesian(spark, sf_dir):
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.similarity import (
        hard_negatives,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    plan = physical_plan(hard_negatives(emb, k=3, n_planes=4, dim=64))
    # candidates must come from the LSH bucket equi-join — an
    # all-pairs fallback would show up as a nested-loop/cartesian
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_packing_moves_data_through_one_range_shuffle(spark, sf_dir):
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.packing import (
        pack_documents,
    )

    d = load_table(spark, sf_dir, "documents")
    df = pack_documents(d, "doc_id", F.size(F.split(F.col("text"), " ")), budget=256)
    # the corpus crosses the wire in the range repartition only: after
    # execution AQE must show the offsets branch READING THE SAME
    # exchange (ReusedExchange), and the offsets join-back must be
    # broadcast, not another full-data exchange
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan
    assert uses_broadcast_join(df)


def test_join_hints_override_strategy_choice(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    # orders is small enough to auto-broadcast; a merge hint must
    # force the shuffle-sort path anyway (the manual override used
    # when a "small" side is known to blow up at production scale)
    merged = li.join(o.hint("merge"), li["l_orderkey"] == o["o_orderkey"])
    assert "SortMergeJoin" in physical_plan(merged)
    # and the broadcast hint must override a statistics miss
    bcast = li.join(o.hint("broadcast"), li["l_orderkey"] == o["o_orderkey"])
    assert uses_broadcast_join(bcast)


def test_runtime_bloom_filter_reduces_fact_before_shuffle(spark, sf_dir):
    # the registry query materializes eagerly (conf scoping), so pin
    # the plan on an identically-shaped un-checkpointed join: with the
    # application-side threshold cleared, InjectRuntimeFilter must
    # push a bloom-filter might_contain predicate into the fact side
    # of the MERGE-hinted join
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        # isProbablyShuffleJoin refuses when the dim is broadcast-able
        # by size — at toy SF every dim is, so force the shuffle regime
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        l = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        df = l.join(o.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        plan = physical_plan(df)
        assert "might_contain" in plan.lower()
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_no_fact_sized_global_windows_in_fixed_queries(spark, sf01_dir):
    """Round-8 pin: the five queries the round-7 audit flagged for
    single-partition global windows (plus the two customer-sized watch
    items) must keep ZERO unpartitioned WindowExec nodes over a
    fact-sized input. The detector reads RUNTIME input rows off the
    executed plan, so the |partitions|-row offset cumsum inside
    global_rank/ntile_exact and post-TakeOrdered rank attaches stay
    permitted; anything >= 1000 input rows at sf0.01 is a regression."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark import (
        registry,
    )
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.plans.explain import (
        count_global_windows,
    )

    fixed = [
        "woe_binning", "layout_locality_audit", "histogram_selectivity",
        "item_cooccurrence_similarity", "hybrid_search_rrf",
        "rfm_segments", "pareto_revenue_curve", "part_skyline",
    ]
    for name in fixed:
        df = registry.QUERIES[name](spark, sf01_dir)
        df.collect()  # metrics live on the executed tree
        assert count_global_windows(df, min_input_rows=1000) == 0, name


def test_global_window_detector_sees_the_bad_shape(spark):
    """The detector itself must fire on the anti-pattern, else the pin
    above passes vacuously."""
    from pyspark.sql import Window

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.plans.explain import (
        count_global_windows,
        global_window_input_rows,
    )

    df = spark.range(5000).withColumn(
        "r", F.row_number().over(Window.orderBy("id"))
    )
    df.collect()
    assert global_window_input_rows(df) == [5000]
    assert count_global_windows(df, min_input_rows=1000) == 1
    # partitioned windows never count
    ok = spark.range(5000).withColumn("g", F.col("id") % 7).withColumn(
        "r", F.row_number().over(Window.partitionBy("g").orderBy("id"))
    )
    ok.collect()
    assert count_global_windows(ok) == 0
