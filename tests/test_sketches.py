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


def test_rrf_fuse_hand_case(spark):
    """RRF on a hand-computable pair of rankings, including an id
    present in only one ranking (contributes 0 from the other)."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.search import (
        rrf_fuse,
    )

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank long")
    b = spark.createDataFrame([(2, 1), (4, 2)], "doc_id long, rank long")
    out = {
        r["doc_id"]: (r["rank_a"], r["rank_b"], r["rrf_micro"])
        for r in rrf_fuse([("a", a), ("b", b)], k=60).collect()
    }
    # round(1e6/61)=16393, /62=16129, /63=15873
    assert out[1] == (1, None, 16393)
    assert out[2] == (2, 1, 16129 + 16393)
    assert out[3] == (3, None, 15873)
    assert out[4] == (None, 2, 16129)


def test_bm25_query_scores_integer_and_global_df(spark):
    """bm25_micro is BIGINT and df is computed before the query-term
    filter: a term's idf must reflect its full-corpus df."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.tfidf import (
        bm25_query_scores,
    )

    docs = spark.createDataFrame(
        [(1, "x y"), (2, "x z"), (3, "z z")], "doc_id long, text string"
    )
    out = bm25_query_scores(docs, ["x"]).collect()
    assert {r["doc_id"] for r in out} == {1, 2}
    assert all(isinstance(r["bm25_micro"], int) for r in out)
    # df(x)=2 of N=3 → idf = ln(1 + (3-2+0.5)/(2+0.5)) = ln(1.6);
    # doc 1: tf=1, dl=2, avgdl=2 → norm = 1 + 1.2*1.0 = 2.2
    import math
    want = round(round(math.log(1.6) * 1 * 2.2 / 2.2, 6) * 1_000_000)
    got = {r["doc_id"]: r["bm25_micro"] for r in out}
    assert got[1] == want


def test_cms_stream_equals_direct(spark):
    """The maintained streaming sketch equals the direct sketch
    cell-for-cell after a guarded 3-micro-batch replay."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.streaming.sketch_stream import (
        cms_stream_phased,
    )

    rows = [(f"k{i % 23}",) for i in range(300)]
    full = spark.createDataFrame(rows, "key string")
    phases = [
        spark.createDataFrame(rows[:100], "key string"),
        spark.createDataFrame(rows[100:150], "key string"),
        spark.createDataFrame(rows[150:], "key string"),
    ]
    store, stats = cms_stream_phased(spark, phases, "key", depth=3, width=32)
    assert stats["data_batches"] == 3
    assert stats["rows_per_batch"] == [100, 50, 150]
    counts = full.groupBy("key").agg(F.count(F.lit(1)).cast("long").alias("n"))
    direct = cms_build(counts, "key", "n", depth=3, width=32)
    got = {(r["seed"], r["bucket"]): r["counter"] for r in store.collect()}
    want = {(r["seed"], r["bucket"]): r["counter"] for r in direct.collect()}
    assert got == want


def test_span_corruption_non_overlapping(spark):
    """Spans are block-confined: every span fits inside its 20-token
    block, so spans never overlap and never cross doc length."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.registry import (
        q_span_corruption_plan,
    )

    out = q_span_corruption_plan(spark, "/root/testdata/sf0.001").collect()
    assert out
    for r in out:
        lo, hi = r["block"] * 20, r["block"] * 20 + 20
        assert lo <= r["span_start"] and r["span_start"] + 3 <= hi
        assert len(r["span_text"].split(" ")) == 3
    # per (doc, block) exactly one span
    keys = [(r["doc_id"], r["block"]) for r in out]
    assert len(keys) == len(set(keys))


def test_blocking_quality_on_known_dups(spark):
    """Near-identical docs must be caught by the banded blocking
    (pair completeness 1.0 on an easy corpus); counts are consistent."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.dedup_near import (
        blocking_quality,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(1, base), (2, base + " extra"), (3, "totally different words here now")]
    rows += [(10 + i, f"unique doc number {i} with filler tokens {i*7}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = blocking_quality(df).collect()[0]
    assert r["n_exact"] >= 1                      # docs 1,2 are ≥0.5 Jaccard
    assert r["n_caught"] == r["n_exact"]          # easy pair: completeness 1.0
    assert r["pair_completeness"] == 1.0
    assert r["n_caught"] <= r["n_candidates"]
    assert 0.0 <= r["reduction_ratio"] <= 1.0


def test_cms_inner_product_never_underestimates(spark):
    """Sketch inner product >= true equi-join size; equality when the
    grids are collision-free."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.sketches import (
        cms_inner_product,
    )

    a = spark.createDataFrame(
        [("k1", 3), ("k2", 5), ("k3", 2)], "key string, n long"
    )
    b = spark.createDataFrame(
        [("k1", 4), ("k3", 10), ("k9", 7)], "key string, n long"
    )
    true_size = 3 * 4 + 2 * 10  # k1, k3
    sk_a = cms_build(a, "key", "n", depth=4, width=256)
    sk_b = cms_build(b, "key", "n", depth=4, width=256)
    est = cms_inner_product(sk_a, sk_b).collect()[0]["est_size"]
    assert est >= true_size
    # 4 distinct keys in 256 buckets: collisions are possible but each
    # row's IP only ADDS mass — at this density all four rows are
    # almost surely exact; accept any value in [true, true + slack]
    assert est <= true_size + 5 * 10 * 4


def test_psi_stream_batch0_is_zero_and_drift_detected(spark):
    """Batch 0 scores its own reference (psi exactly 0.0); a shifted
    batch produces strictly positive psi."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.streaming.drift_stream import (
        psi_stream_phased,
    )

    # same support (bins 1-5) but heavily shifted mass — disjoint
    # supports would yield NULL psi (every common-bin term skipped)
    ref_rows = [(float(100 + (i % 5) * 100),) for i in range(200)]
    shifted = [(float(100 + (i % 5 if i % 7 else 4) * 100),) for i in range(120)]
    p0 = spark.createDataFrame(ref_rows, "value double")
    p1 = spark.createDataFrame(shifted, "value double")
    out, stats = psi_stream_phased(spark, [p0, p1], reference=p0)
    assert stats["data_batches"] == 2
    rows = {r["batch_id"]: r for r in out.collect()}
    assert rows[0]["psi"] == 0.0
    assert rows[0]["n_batch"] == 200
    assert rows[1]["n_batch"] == 120
    assert rows[1]["psi"] > 0.05  # shifted mass (hand-check: ~0.0724)
