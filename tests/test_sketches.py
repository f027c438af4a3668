"""Count-min sketch: engine-exact hashing, overestimate invariant,
exact mergeability."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.sketches import (
    cms_bucket_col,
    cms_bucket_sql,
    cms_build,
    cms_estimate,
)

TOKENS = ["the", "quick", "brown", "fox", "", "a b", "Ünïcode", "0", "zzz"]


def test_bucket_hash_engine_exact(spark):
    """The Spark bucket column and the generated DuckDB SQL must agree
    bit-for-bit for every seed — the whole sketch rests on this."""
    df = spark.createDataFrame([(t,) for t in TOKENS], "token string")
    got = df.select(
        "token", *[cms_bucket_col(F.col("token"), j, 256).alias(f"b{j}") for j in range(4)]
    ).collect()
    con = duckdb.connect()
    for row in got:
        for j in range(4):
            want = con.execute(
                f"SELECT {cms_bucket_sql('?', j, 256)}", [row["token"]]
            ).fetchone()[0]
            assert row[f"b{j}"] == want, (row["token"], j)
    con.close()


def test_cms_overestimate_and_merge(spark):
    """Point estimates never under-count, and shard-sketch sum equals
    the direct sketch cell-for-cell (integer counters are additive)."""
    rows = [(f"tok{i % 37}", 1) for i in range(500)] + [("hot", 100)]
    df = spark.createDataFrame(rows, "token string, cnt long")
    counts = df.groupBy("token").agg(F.sum("cnt").cast("long").alias("cnt"))
    sk = cms_build(counts, "token", "cnt", depth=3, width=16)
    est = {
        r["token"]: r["n_est"]
        for r in cms_estimate(sk, counts, "token", depth=3, width=16).collect()
    }
    exact = {r["token"]: r["cnt"] for r in counts.collect()}
    assert set(est) == set(exact)
    for t, n in exact.items():
        assert est[t] >= n, t
    assert est["hot"] >= 100

    # mergeability: split rows in half, sum the two sketches
    a = spark.createDataFrame(rows[:250], "token string, cnt long")
    b = spark.createDataFrame(rows[250:], "token string, cnt long")

    def sketch(d):
        c = d.groupBy("token").agg(F.sum("cnt").cast("long").alias("cnt"))
        return cms_build(c, "token", "cnt", depth=3, width=16)

    merged = (
        sketch(a).unionByName(sketch(b))
        .groupBy("seed", "bucket")
        .agg(F.sum("counter").cast("long").alias("counter"))
    )
    d_cells = {(r["seed"], r["bucket"]): r["counter"] for r in sk.collect()}
    m_cells = {(r["seed"], r["bucket"]): r["counter"] for r in merged.collect()}
    assert d_cells == m_cells


def test_cms_unknown_key_estimates_zero_or_collision(spark):
    """A key never inserted estimates 0 unless every one of its cells
    collides — with an empty sketch the estimate is exactly 0."""
    counts = spark.createDataFrame([("x", 5)], "token string, cnt long")
    sk = cms_build(counts, "token", "cnt", depth=4, width=256)
    probe = spark.createDataFrame([("never-seen-token",)], "token string")
    out = cms_estimate(sk, probe, "token", depth=4, width=256).collect()
    assert out[0]["n_est"] in (0, 5)  # 0 unless all 4 cells collide with 'x'
