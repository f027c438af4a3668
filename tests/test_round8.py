"""Round-8 unit tests: IVF-PQ search semantics (vs brute-force ADC),
global_rank consistency under complex plan trees (the exchange-reuse
bug class), ntile_exact parity with SQL NTILE, the DP quantile-table
mechanism, and plan pins for the new query family."""

from __future__ import annotations

from pyspark.sql import functions as F


def _brute_ivf_pq(rows, cents, books, dim, nprobe, k):
    """Pure-Python reference for ivf_pq_search on small inputs."""
    m, dsub = len(books), dim // len(books)

    def ints(v):
        import math

        return [int(math.floor(float(x) * 1_000_000)) for x in v]

    def sq(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    corpus = [(i, ints(v)) for i, v in rows if i >= 3]
    queries = [(i, ints(v)) for i, v in rows if i < 3]
    enc = {}
    for i, e in corpus:
        cell = min(range(len(cents)), key=lambda c: (sq(e, cents[c]), c))
        codes = [
            min(
                range(len(books[s])),
                key=lambda j: (sq(e[s * dsub:(s + 1) * dsub], books[s][j]), j),
            )
            for s in range(m)
        ]
        enc[i] = (cell, codes)
    out = []
    for qid, qe in queries:
        probe = sorted(
            range(len(cents)), key=lambda c: (sq(qe, cents[c]), c)
        )[:nprobe]
        cand = []
        for i, (cell, codes) in enc.items():
            if cell not in probe:
                continue
            adc = sum(
                sq(qe[s * dsub:(s + 1) * dsub], books[s][codes[s]])
                for s in range(m)
            )
            cand.append((adc, i))
        for r, (adc, i) in enumerate(sorted(cand)[:k], start=1):
            out.append((qid, i, adc, r))
    return set(out)


def test_ivf_pq_search_matches_bruteforce(spark, sf_dir):
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.similarity import (
        ivf_pq_search,
        pq_codebooks,
    )
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    rows = [(r["vec_id"], r["embedding"]) for r in emb.collect()]
    cents = pq_codebooks(1, 8, 64)[0]
    books = pq_codebooks(4, 4, 16)
    got = {
        (r["q_id"], r["vec_id"], r["adc"], r["rank"])
        for r in ivf_pq_search(
            emb.where(F.col("vec_id") >= 3),
            emb.where(F.col("vec_id") < 3).select(
                F.col("vec_id").alias("q_id"),
                F.col("embedding").alias("q_emb"),
            ),
            cents,
            books,
            dim=64,
            nprobe=2,
            k=10,
        ).collect()
    }
    assert got == _brute_ivf_pq(rows, cents, books, 64, 2, 10)
    assert got  # non-vacuous


def test_global_rank_consistent_inside_complex_plans(spark):
    """Regression for the round-8 bug: global_rank's offsets branch
    and main branch must agree even when the ranked table is consumed
    through a crossJoin-of-own-aggregate tree (where exchange reuse
    is NOT guaranteed). The eager localCheckpoint pin makes rank a
    dense permutation 1..n in ANY consuming plan."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.windows import (
        ntile_exact,
    )

    df = spark.range(10_000).select(
        (F.col("id") * 37 % 1000).alias("v"), F.col("id").alias("tid")
    )
    binned = ntile_exact(df, ["v", "tid"], 10, bucket_col="b")
    per = binned.groupBy("b").agg(F.count(F.lit(1)).alias("n"))
    tot = per.agg(F.sum("n").alias("t"))
    out = per.crossJoin(F.broadcast(tot)).collect()
    assert len(out) == 10
    assert all(r["n"] == 1000 for r in out)
    assert all(r["t"] == 10_000 for r in out)


def test_ntile_exact_matches_sql_ntile(spark):
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.windows import (
        ntile_exact,
    )

    # n not divisible by k: first n%k buckets get the extra row
    df = spark.range(103).select(
        (F.col("id") * 7 % 50).alias("v"), F.col("id").alias("tid")
    )
    got = {
        (r["v"], r["tid"], r["b"])
        for r in ntile_exact(df, ["v", "tid"], 7, bucket_col="b").collect()
    }
    df.createOrReplaceTempView("_nt")
    want = {
        tuple(r)
        for r in spark.sql(
            "SELECT v, tid, CAST(ntile(7) OVER (ORDER BY v, tid) AS LONG) "
            "FROM _nt"
        ).collect()
    }
    assert got == want


def test_dp_noise_table_is_symmetric_and_bounded():
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.registry import (
        _dp_noise_table,
    )

    t = _dp_noise_table(scale=2.0, cells=64)
    assert len(t) == 64
    # two-sided symmetry of the quantile table
    assert t == [-x for x in reversed(t)]
    # mass concentrated near zero, tails bounded by the inverse CDF
    assert min(t) < 0 < max(t)
    assert max(abs(x) for x in t) <= 12


def test_new_queries_plan_shapes(spark, sf01_dir):
    """ivf_pq_search: corpus side must reach the probe join via
    broadcast (fact never shuffles for candidate generation);
    curriculum/zipf: no fact-sized global window."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark import (
        registry,
    )
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.plans.explain import (
        count_global_windows,
        physical_plan,
        uses_broadcast_join,
    )

    sf = sf01_dir
    pq = registry.QUERIES["ivf_pq_search"](spark, sf)
    pq.collect()
    assert uses_broadcast_join(pq)
    for name in ("curriculum_plan", "zipf_rank_frequency",
                 "heaps_vocab_growth", "dp_noisy_histogram"):
        df = registry.QUERIES[name](spark, sf)
        df.collect()
        assert count_global_windows(df, min_input_rows=1000) == 0, name
    # zipf's top-100 cut must compile to TakeOrdered, not a global sort
    z = registry.QUERIES["zipf_rank_frequency"](spark, sf)
    z.collect()
    assert "TakeOrderedAndProject" in physical_plan(z)
