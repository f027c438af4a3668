"""Unit tests for the round-3 wired operators: distributed global
rank/ntile, BPE token accounting, content checksum, label centroids."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.integrity import (
    content_checksum,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.similarity import (
    label_centroids,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.text import (
    bpe_token_stats,
    bpe_tokens,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.windows import (
    global_rank,
    ntile_exact,
)


def test_global_rank_matches_single_partition_window(spark):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") * 37 % 101).alias("v")
    )
    got = {
        r["id"]: r["rank"]
        for r in global_rank(df, ["v", "id"], num_partitions=7).collect()
    }
    from pyspark.sql import Window

    want = {
        r["id"]: r["rank"]
        for r in df.withColumn(
            "rank", F.row_number().over(Window.orderBy("v", "id")).cast("long")
        ).collect()
    }
    assert got == want


def test_global_rank_independent_of_partition_count(spark):
    df = spark.range(500).select(F.col("id"), (F.col("id") % 13).alias("v"))
    a = sorted(global_rank(df, ["v", "id"], num_partitions=3).collect())
    b = sorted(global_rank(df, ["v", "id"], num_partitions=11).collect())
    assert a == b


@pytest.mark.parametrize("n,k", [(10, 3), (12, 4), (7, 7), (5, 8)])
def test_ntile_exact_matches_sql_ntile(spark, n, k):
    df = spark.range(n).select(F.col("id"))
    got = {
        r["id"]: r["bucket"] for r in ntile_exact(df, ["id"], k).collect()
    }
    from pyspark.sql import Window

    want = {
        r["id"]: r["b"]
        for r in df.withColumn(
            "b", F.ntile(k).over(Window.orderBy("id")).cast("long")
        ).collect()
    }
    assert got == want


def test_bpe_tokens_splits_contractions_and_numbers(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="It's over 9000, really!")])
    toks = df.select(bpe_tokens("text").alias("t")).first()["t"]
    assert toks == ["It", "'s", " over", " 9000", ",", " really", "!"]


def test_bpe_token_stats_counts(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="hello world"), Row(doc_id=2, text="")]
    )
    rows = {r["doc_id"]: r for r in bpe_token_stats(df).collect()}
    assert rows[1]["n_bpe_tokens"] == 2
    assert rows[1]["n_ws_tokens"] == 2
    assert rows[1]["fertility"] == 1.0
    assert rows[2]["n_bpe_tokens"] == 0
    assert rows[2]["fertility"] == 0.0


def test_content_checksum_is_order_and_partition_independent(spark):
    rows = [Row(k=i, s=f"row-{i}", g="a" if i % 2 else "b") for i in range(200)]
    df1 = spark.createDataFrame(rows).repartition(1)
    df2 = spark.createDataFrame(list(reversed(rows))).repartition(13)
    a = sorted(content_checksum(df1, ["k", "s"], group_by="g").collect())
    b = sorted(content_checksum(df2, ["k", "s"], group_by="g").collect())
    assert a == b
    # and detects a single-row content change
    mutated = [Row(k=0, s="row-MUTATED", g="b")] + rows[1:]
    c = sorted(content_checksum(spark.createDataFrame(mutated), ["k", "s"], group_by="g").collect())
    assert a != c


def test_label_centroids_exact_small(spark):
    df = spark.createDataFrame(
        [
            Row(label=0, embedding=[1.0, 0.0]),
            Row(label=0, embedding=[3.0, 2.0]),
            Row(label=1, embedding=[-1.0, -1.0]),
        ]
    )
    got = {
        (r["label"], r["dim"]): (r["n_vectors"], r["centroid"])
        for r in label_centroids(df).collect()
    }
    assert got == {
        (0, 0): (2, 2.0),
        (0, 1): (2, 1.0),
        (1, 0): (1, -1.0),
        (1, 1): (1, -1.0),
    }
