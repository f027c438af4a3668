"""Unit tests for shingle-boilerplate scoring and stream-side dedup."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.boilerplate import (
    boilerplate_scores,
    shingles,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.streaming.dedup import (
    stream_dedup_once,
)


def test_shingles_order_and_count(spark):
    df = spark.createDataFrame([Row(text="a b c d e")])
    got = df.select(shingles("text", 3).alias("s")).first()["s"]
    assert got == ["a b c", "b c d", "c d e"]
    short = spark.createDataFrame([Row(text="a b")])
    assert short.select(shingles("text", 3).alias("s")).first()["s"] == []


def test_boilerplate_scores_flags_shared_template(spark):
    header = "subscribe to our newsletter now"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"{header} unique alpha words one"),
            Row(doc_id=2, text=f"{header} different beta tokens two"),
            Row(doc_id=3, text="entirely original content nothing shared here ok"),
            Row(doc_id=4, text="tiny"),  # shorter than the shingle width
        ]
    )
    out = {
        r["doc_id"]: r
        for r in boilerplate_scores(docs, n=5, min_docs=2).collect()
    }
    # docs 1 and 2 share exactly the 5-token header shingle
    assert out[1]["n_common"] == 1 and out[2]["n_common"] == 1
    assert out[1]["n_shingles"] == 5  # 9 tokens -> 5 distinct 5-grams
    assert out[1]["boilerplate_ratio"] == 0.2
    assert out[3]["n_common"] == 0 and out[3]["boilerplate_ratio"] == 0.0
    assert out[4]["n_shingles"] == 0 and out[4]["boilerplate_ratio"] == 0.0


def test_stream_dedup_suppresses_double_delivery(spark, sf_dir):
    events = os.path.join(sf_dir, "events.parquet")
    out = stream_dedup_once(
        spark, events, key_cols=["event_id"], group_cols=["event_type"]
    )
    got = {r["event_type"]: r["n_events"] for r in out.collect()}
    want = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(events)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # every event was delivered twice; dedup restores single-delivery counts
    assert got == want
