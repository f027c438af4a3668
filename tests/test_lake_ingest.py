"""Unit tests: CSV corrupt-record quarantine and schema evolution."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T


def _csv_fixture(tmp_path):
    p = os.path.join(str(tmp_path), "mixed")
    os.makedirs(p)
    with open(os.path.join(p, "x.csv"), "w") as f:
        f.write("1,F,10.5\n")
        f.write("garbage-line-0\n")
        f.write("notanum,X,notadouble\n")
        f.write("2,O,3.5,extra,extra\n")
    return p


SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("s", T.StringType()),
        T.StructField("p", T.DoubleType()),
        T.StructField("_corrupt", T.StringType()),
    ]
)


def test_csv_quarantine_catches_all_malformation_kinds(spark, tmp_path):
    spark.conf.set("spark.sql.csv.parser.columnPruning.enabled", "false")
    try:
        raw = (
            spark.read.schema(SCHEMA)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt")
            .csv(_csv_fixture(tmp_path))
        )
        # under-arity, type failure, and over-arity all quarantine —
        # but ONLY with parser column pruning off: a pruned parse
        # skips the malformed fields and misses them (the trap the
        # csv_ingest_with_dlq query documents)
        # the aggregate must touch a data column too: a plan that
        # reads ONLY the corrupt column is rejected outright
        out = raw.agg(
            F.sum(F.when(F.col("_corrupt").isNotNull(), 1).otherwise(0)).alias("bad"),
            F.sum(F.when(F.col("_corrupt").isNull(), 1).otherwise(0)).alias("good"),
            F.sum(F.when(F.col("_corrupt").isNull(), F.col("p"))).alias("clean_p"),
            F.sum("p").alias("all_p"),
        ).collect()[0]
        assert (out.good, out.bad) == (1, 3)
        # PERMISSIVE quirk: a quarantined over-arity row KEEPS the
        # fields that parsed (here p=3.5), so naive sums leak poison
        # values — clean-side metrics must condition on _corrupt
        assert out.clean_p == 10.5
        assert out.all_p == 14.0
    finally:
        spark.conf.unset("spark.sql.csv.parser.columnPruning.enabled")


def test_merge_schema_widens_without_rewrite(spark, tmp_path):
    root = str(tmp_path)
    old = spark.createDataFrame([(1, 10.0)], ["k", "v"])
    new = spark.createDataFrame([(2, 20.0, "x")], ["k", "v", "tag"])
    old.write.parquet(os.path.join(root, "g1"))
    new.write.parquet(os.path.join(root, "g2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(root, "g1"), os.path.join(root, "g2")
    )
    rows = {r.k: r for r in merged.collect()}
    assert set(merged.columns) == {"k", "v", "tag"}
    assert rows[1].tag is None and rows[2].tag == "x"
