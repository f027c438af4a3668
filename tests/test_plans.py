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
    has_pushed_filter,
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
