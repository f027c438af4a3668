"""Physical-layout contracts: bucketed joins are shuffle-free,
partitioned scans prune directories."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.plans.explain import (
    count_shuffles,
    physical_plan,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources import (
    load_table,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources.layout import (
    read_table,
    write_bucketed_table,
    write_partitioned,
)


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    write_bucketed_table(o, "orders_b", "o_orderkey", 8)
    write_bucketed_table(
        l.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b", "o_orderkey", 8
    )
    # force the shuffle-join path (auto-broadcast would hide the point)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, "lineitem_b").join(
            read_table(spark, "orders_b").select("o_orderkey", "o_orderpriority"),
            "o_orderkey",
        )
        # co-bucketed layout: the equi-join needs no shuffle Exchange
        n_shuffles = count_shuffles(joined)
        assert n_shuffles == 0, physical_plan(joined)[:2000]
        assert joined.count() > 0
        # grouping on the bucket key is also shuffle-free (partial agg only)
        agg = read_table(spark, "lineitem_b").groupBy("o_orderkey").count()
        assert count_shuffles(agg) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    e = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_part")
    write_partitioned(e, path, ["event_type"])
    # hive-style layout on disk
    assert any(d.startswith("event_type=") for d in os.listdir(path))
    scan = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = physical_plan(scan)
    assert "PartitionFilters" in plan and "event_type" in plan
    n_click = e.filter(F.col("event_type") == "click").count()
    assert scan.count() == n_click


def test_zorder_key_clusters_both_dimensions(spark):
    """Sorting by the Morton key must give per-chunk min/max ranges
    that are tight on BOTH dimensions — that's the entire point of
    Z-ordering vs a single-column sort (perfect on x, useless on y)."""
    import pyspark.sql.functions as F

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources.layout import (
        zorder_key,
    )

    n, chunks = 4096, 16
    df = spark.range(n).select(
        (F.col("id") * 2654435761 % 1024).alias("x"),
        (F.col("id") * 40503 % 1024).alias("y"),
    )

    def chunk_span_sum(sorted_df, dim):
        ranked = sorted_df.coalesce(1).withColumn(
            "chunk", (F.monotonically_increasing_id() / (n // chunks)).cast("int")
        )
        spans = (
            ranked.groupBy("chunk")
            .agg((F.max(dim) - F.min(dim)).alias("span"))
            .agg(F.sum("span"))
            .first()[0]
        )
        return spans

    z = df.withColumn("zkey", zorder_key("x", "y", bits=10)).orderBy("zkey")
    by_x = df.orderBy("x")

    # x-sort: x spans are ~0 but y spans are full-range (~1023 each)
    assert chunk_span_sum(by_x, "y") > 1000 * chunks * 0.9
    # z-order: BOTH dimensions stay clustered (~sqrt(cells per chunk))
    assert chunk_span_sum(z, "x") < 1000 * chunks * 0.5
    assert chunk_span_sum(z, "y") < 1000 * chunks * 0.5


def test_zorder_key_known_interleave(spark):
    import pyspark.sql.functions as F

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources.layout import (
        zorder_key,
    )

    df = spark.createDataFrame([(3, 5)], "x long, y long")
    # x=0b011 -> odd bits, y=0b101 -> even bits: 0b011011 -> wait:
    # interleave x_i -> bit 2i+1, y_i -> bit 2i:
    # y0=1 -> 1, x0=1 -> 2, y1=0 -> 0, x1=1 -> 8, y2=1 -> 16, x2=0 -> 0
    # total = 1 + 2 + 8 + 16 = 27
    assert df.select(zorder_key("x", "y", 10).alias("z")).first()["z"] == 27


def test_zorder_key_is_a_bijection_on_the_grid(spark):
    """All 32x32 quantized pairs must map to 1024 DISTINCT keys filling
    exactly [0, 1023] — interleaving is a bijection, so file ranges
    partition the space with no overlap and no gaps."""
    import pyspark.sql.functions as F

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources.layout import (
        zorder_key,
    )

    grid = spark.range(1024).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y")
    )
    keys = grid.select(zorder_key("x", "y", bits=5).alias("z"))
    stats = keys.agg(
        F.countDistinct("z").alias("d"), F.min("z").alias("lo"), F.max("z").alias("hi")
    ).first()
    assert (stats["d"], stats["lo"], stats["hi"]) == (1024, 0, 1023)


def test_write_sharded_deterministic_layout(spark, tmp_path):
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources.layout import (
        shard_assignment,
        write_sharded,
    )

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    p1 = str(tmp_path / "shards_a")
    p2 = str(tmp_path / "shards_b")
    write_sharded(df, p1, "doc_id", num_shards=8)
    # a differently-partitioned input must produce IDENTICAL shards
    write_sharded(df.repartition(13), p2, "doc_id", num_shards=8)

    dirs = sorted(d for d in os.listdir(p1) if d.startswith("shard_id="))
    assert len(dirs) == 8
    back1 = spark.read.parquet(p1)
    assert back1.count() == 500
    # membership matches the manifest-side assignment expression
    expect = {
        (r["doc_id"], r["shard_id"])
        for r in shard_assignment(df, "doc_id", 8).collect()
    }
    got = {(r["doc_id"], int(r["shard_id"])) for r in back1.collect()}
    assert got == expect

    # intra-shard order is the md5 order, identical across both writes
    for d in dirs:
        rows1 = [
            r["doc_id"]
            for r in spark.read.parquet(os.path.join(p1, d)).collect()
        ]
        rows2 = [
            r["doc_id"]
            for r in spark.read.parquet(os.path.join(p2, d)).collect()
        ]
        assert rows1 == rows2
        hashes = {
            r["doc_id"]: r["order_hash"]
            for r in shard_assignment(df, "doc_id", 8).collect()
        }
        assert rows1 == sorted(rows1, key=lambda i: hashes[i])
