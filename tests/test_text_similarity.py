"""Unit tests: text-analysis, near-dedup, and similarity operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.functions.hashing import (
    hamming64,
    simhash64,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.functions.vector import (
    cosine_similarity,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.dedup_near import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingles,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.similarity import (
    cosine_topk,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.text import (
    lang_id,
    quality_score,
    text_stats,
    token_frequencies,
)


def test_text_stats_basic(spark):
    df = spark.createDataFrame([(1, "a b a c")], ["doc_id", "text"])
    r = text_stats(df).collect()[0]
    assert r.n_tokens == 4 and r.n_distinct_tokens == 3
    assert r.type_token_ratio == 0.75 and r.avg_token_len == 1.0


def test_quality_score_stopword_density(spark):
    df = spark.createDataFrame(
        [(1, "the a of is and"), (2, "xylophone quartz vortex")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in quality_score(df).collect()}
    assert rows[1].n_stopwords == 5 and rows[1].stop_ratio == 1.0
    assert rows[2].n_stopwords == 0
    assert rows[1].quality == 0.0  # all-stopword doc scores zero
    assert 0 < rows[2].quality <= 1


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of a house"),
            (2, "der hund und die katze ist da"),
            (3, "qqq www zzz"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r.predicted_lang for r in lang_id(df).collect()}
    assert rows == {1: "en", 2: "de", 3: "und"}


def test_token_frequencies_topk_deterministic(spark):
    df = spark.createDataFrame([(1, "b a b c a b")], ["doc_id", "text"])
    rows = token_frequencies(df, k=2).collect()
    assert [(r.token, r.n_occurrences, r.rank) for r in rows] == [("b", 3, 1), ("a", 2, 2)]


def test_shingles_short_doc_empty(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "a b c d")], ["doc_id", "text"])
    rows = {r.doc_id: r.sh for r in df.select("doc_id", shingles("text").alias("sh")).collect()}
    assert rows[1] == []
    assert rows[2] == ["a b c", "b c d"]


def test_ngram_jaccard_finds_planted_near_dup(spark):
    base = "one two three four five six seven eight nine ten"
    near = "one two three four five six seven eight nine eleven"
    other = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], ["doc_id", "text"]
    )
    pairs = ngram_jaccard_pairs(df, threshold=0.5).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p.d1, p.d2) == (1, 2) and p.shared == 7 and p.n1 == 8


def test_minhash_lsh_finds_planted_near_dup(spark):
    base = "one two three four five six seven eight nine ten"
    near = "one two three four five six seven eight nine eleven"
    other = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame([(1, base), (2, near), (3, other)], ["doc_id", "text"])
    pairs = minhash_lsh_pairs(df, jaccard_distance_threshold=0.5).collect()
    assert [(p.d1, p.d2) for p in pairs] == [(1, 2)]


def test_simhash_identical_and_disjoint(spark):
    df = spark.createDataFrame(
        [(1, "x y z w"), (2, "x y z w"), (3, "p q r s")], ["doc_id", "text"]
    )
    out = df.select("doc_id", simhash64(F.col("text")).alias("sh"))
    a = out.alias("a").crossJoin(out.alias("b")).filter(F.expr("a.doc_id < b.doc_id"))
    d = {
        (r["ad"], r["bd"]): r.h
        for r in a.select(
            F.col("a.doc_id").alias("ad"), F.col("b.doc_id").alias("bd"),
            hamming64(F.col("a.sh"), F.col("b.sh")).alias("h"),
        ).collect()
    }
    assert d[(1, 2)] == 0        # identical docs → identical fingerprints
    assert d[(1, 3)] > 10        # disjoint vocab → far fingerprints


def test_cosine_similarity_exact_values(spark):
    schema = T.StructType(
        [
            T.StructField("a", T.ArrayType(T.FloatType())),
            T.StructField("b", T.ArrayType(T.FloatType())),
        ]
    )
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 0.0])],
        schema,
    )
    vals = [r.c for r in df.select(F.round(cosine_similarity("a", "b"), 6).alias("c")).collect()]
    assert vals[0] == 1.0 and vals[1] == 0.0 and vals[2] == pytest.approx(0.707107)


def test_cosine_topk_orders_and_limits(spark):
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]), (4, [-1.0, 0.0])], schema
    )
    q = corpus.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    rows = cosine_topk(corpus, q, k=2).orderBy("rank").collect()
    assert [r.vec_id for r in rows] == [1, 2]  # self first, then closest
    assert rows[0].similarity == 1.0


def test_minhash_seeds_produce_distinct_hash_functions(spark):
    """Regression: the seeded minhash family must actually vary with
    the seed. A 2-arg lambda inside F.transform is interpreted by
    PySpark as (element, index) — which once silently collapsed all
    num_hashes 'seeded' hashes into one function (and LSH banding with
    identical rows per band finds only trivial candidates)."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.dedup_near import (
        minhash_exprs,
    )

    df = spark.createDataFrame([(["a b c", "b c d", "c d e"],)], "sh array<string>")
    row = df.select(
        *[e.alias(f"m{j}") for j, e in enumerate(minhash_exprs(8))]
    ).collect()[0]
    assert len({row[f"m{j}"] for j in range(8)}) == 8


def test_minhash_banded_equals_exact_at_high_bands(spark):
    """r=2/b=16 banding + exact verification reproduces the exact
    Jaccard pair set on a corpus whose near-dups are high-similarity."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.dedup_near import (
        minhash_banded_pairs,
    )

    rows = [
        (1, "one two three four five six seven eight nine ten"),
        (2, "one two three four five six seven eight nine eleven"),
        (3, "one two three four nine ten eleven twelve thirteen fourteen"),
        (4, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (5, "alpha beta gamma delta epsilon zeta eta theta iota kappa twelve"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    exact = {
        (r.d1, r.d2, r.jaccard)
        for r in ngram_jaccard_pairs(df, threshold=0.5).collect()
    }
    banded = {
        (r.d1, r.d2, r.jaccard)
        for r in minhash_banded_pairs(
            df, num_hashes=32, bands=16, threshold=0.5
        ).collect()
    }
    assert banded == exact and len(exact) >= 2


def test_ivf_learned_equals_brute_on_clustered_data(spark):
    """On data with real cluster structure, multi-probe learned IVF
    with a small nprobe reproduces brute-force top-k exactly — and is
    deterministic across invocations (hash-defined sample + driver
    Lloyd fit, no distributed float reductions)."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.similarity import (
        ivf_topk_learned,
    )

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    centers = [[10.0, 0.0, 0.0], [0.0, 10.0, 0.0], [0.0, 0.0, 10.0], [5.0, 5.0, 0.0]]
    rows = []
    for i in range(40):
        c = centers[i % 4]
        jitter = [((i * 37 + d * 11) % 7 - 3) * 0.05 for d in range(3)]
        rows.append((i, [c[d] + jitter[d] for d in range(3)]))
    corpus = spark.createDataFrame(rows, schema)
    q = corpus.filter(F.col("vec_id").isin([0, 1])).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    brute = {
        (r.q_id, r.vec_id, r.similarity) for r in cosine_topk(corpus, q, 5).collect()
    }
    got = [
        {
            (r.q_id, r.vec_id, r.similarity)
            for r in ivf_topk_learned(
                corpus, query_ids=[0, 1], k=5, n_clusters=4, nprobe=2
            ).collect()
        }
        for _ in range(2)
    ]
    assert got[0] == brute
    assert got[0] == got[1]


def test_jaccard_counting_and_prefix_paths_agree(spark):
    """The two exact strategies must return identical pairs at the
    same threshold (prefix path forced via threshold ≥ 0.5)."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.dedup_near import (
        _jaccard_counting,
        _jaccard_prefix_filtered,
        _shingle_table,
    )

    rows = [
        (1, "one two three four five six seven eight nine ten"),
        (2, "one two three four five six seven eight nine eleven"),
        (3, "one two three four nine ten eleven twelve thirteen fourteen"),
        (4, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (5, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    docs = _shingle_table(df, "doc_id", "text", 3)
    for t in (0.5, 0.8):
        a = sorted(map(str, _jaccard_counting(docs, t).collect()))
        b = sorted(map(str, _jaccard_prefix_filtered(docs, t, None).collect()))
        assert a == b and len(a) > 0


# ------------------------------------------------ repetition metrics

def test_repetition_stats_known_document(spark):
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.text import (
        repetition_stats,
    )

    df = spark.createDataFrame([(1, "a a a b a c")], ["doc_id", "text"])
    r = repetition_stats(df).collect()[0]
    assert r.n_tokens == 6
    assert r.top_word_n == 4  # 'a' appears 4 times
    assert r.top_word_share == round(4 / 6, 6)
    assert r.top_bigram_n == 2  # 'a a' twice
    assert r.top_bigram_share == 0.4
    assert r.max_run_len == 3  # a a a
    assert bool(r.repetitive) is True


def test_repetition_stats_clean_document(spark):
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.text import (
        repetition_stats,
    )

    df = spark.createDataFrame([(1, "q w e r t y u i o p")], ["doc_id", "text"])
    r = repetition_stats(df).collect()[0]
    assert r.top_word_n == 1 and r.top_bigram_n == 1 and r.max_run_len == 1
    assert bool(r.repetitive) is False


def test_repetition_stats_single_token_edge(spark):
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.text import (
        repetition_stats,
    )

    df = spark.createDataFrame([(1, "solo")], ["doc_id", "text"])
    r = repetition_stats(df).collect()[0]
    assert r.n_tokens == 1 and r.top_bigram_n == 0
    assert r.top_bigram_share == 0.0 and r.max_run_len == 1
    # single-token docs trip the top-word-share rule by definition
    assert r.top_word_share == 1.0 and bool(r.repetitive) is True


def test_lsh_topk_self_at_rank1_and_bucket_locality(spark):
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.similarity import (
        hyperplane_code,
        hyperplanes,
        lsh_topk,
    )

    import math
    import random

    rng = random.Random(7)
    dim = 8
    corpus = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(40)],
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
            ]
        ),
    )
    q = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    out = lsh_topk(corpus, q, k=4, n_planes=3, dim=dim)
    rows = out.collect()
    # each query finds itself at rank 1 (own bucket always probed)
    r1 = {r.q_id: r for r in rows if r.rank == 1}
    assert set(r1) == {0, 1, 2}
    for r in r1.values():
        assert r.vec_id == r.q_id and r.similarity == 1.0
    # every candidate's bucket code is within Hamming-1 of its query's
    planes = hyperplanes(3, dim)
    codes = {
        r.vec_id: r.code
        for r in corpus.select(
            "vec_id", hyperplane_code(F.col("embedding"), planes).alias("code")
        ).collect()
    }
    for r in rows:
        ham = bin(codes[r.q_id] ^ codes[r.vec_id]).count("1")
        assert ham <= 1, (r.q_id, r.vec_id, ham)
    # similarity is non-increasing in rank within each query
    by_q = {}
    for r in sorted(rows, key=lambda r: (r.q_id, r.rank)):
        by_q.setdefault(r.q_id, []).append(r.similarity)
    for sims in by_q.values():
        assert sims == sorted(sims, reverse=True)


def test_hyperplane_code_exact_integer_sign(spark):
    """Bucket bit = sign of the integer-scaled dot product — verified
    against a pure-Python replication of floor(x*1e6) arithmetic."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.similarity import (
        hyperplane_code,
        hyperplanes,
    )

    import math

    vecs = [(1, [0.5, -0.25, 0.125]), (2, [-0.1, 0.9, -0.3])]
    df = spark.createDataFrame(
        vecs,
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
            ]
        ),
    )
    planes = hyperplanes(2, 3)
    got = {
        r.vec_id: r.code
        for r in df.select(
            "vec_id", hyperplane_code(F.col("embedding"), planes).alias("code")
        ).collect()
    }
    import struct

    for vid, v in vecs:
        # replicate float32 storage then floor(x*1e6) exactly
        v32 = [struct.unpack("f", struct.pack("f", x))[0] for x in v]
        e = [math.floor(x * 1000000.0) for x in v32]
        code = 0
        for r, h in enumerate(planes):
            if sum(a * b for a, b in zip(e, h)) > 0:
                code |= 1 << r
        assert got[vid] == code, vid


def test_incremental_dedup_flags_batch_vs_corpus(spark):
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.dedup_near import (
        incremental_dedup,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    existing = spark.createDataFrame(
        [(1, base), (2, "completely different corpus text about spark engines")],
        ["doc_id", "text"],
    )
    incoming = spark.createDataFrame(
        [
            (10, base + " tail"),             # near-dup of doc 1
            (11, "utterly novel content that matches nothing in the lake"),
            (12, "xy"),                        # < n tokens → excluded
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in incremental_dedup(existing, incoming, threshold=0.5).collect()
    }
    assert set(out) == {10, 11}  # doc 12 too short to shingle
    assert out[10]["is_novel"] is False and out[10]["dup_of"] == 1
    assert out[10]["jaccard"] >= 0.5
    assert out[11]["is_novel"] is True and out[11]["dup_of"] is None


def test_incremental_dedup_ignores_within_batch_pairs(spark):
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.dedup_near import (
        incremental_dedup,
    )

    dup = "one two three four five six seven eight nine ten"
    existing = spark.createDataFrame(
        [(1, "entirely unrelated reference document text")], ["doc_id", "text"]
    )
    incoming = spark.createDataFrame(
        [(10, dup), (11, dup)], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r["is_novel"]
        for r in incremental_dedup(existing, incoming).collect()
    }
    # both incoming docs duplicate EACH OTHER but nothing in the
    # corpus: incremental scope marks both novel
    assert out == {10: True, 11: True}


def test_semantic_decontamination_flags_planted_near_dup(spark):
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.similarity import (
        semantic_decontamination,
    )

    import random

    rng = random.Random(7)
    dim = 64
    base = [rng.uniform(-1, 1) for _ in range(dim)]
    # corpus vec 10 is a tiny perturbation of eval vec 100 (identical
    # LSH bucket, cosine ~1); vec 11 is an unrelated random vector
    other = [rng.uniform(-1, 1) for _ in range(dim)]
    corpus = spark.createDataFrame(
        [(10, [x * 1.0001 for x in base]), (11, other)],
        ["vec_id", "embedding"],
    )
    eval_set = spark.createDataFrame(
        [(100, base)], ["eval_id", "eval_emb"]
    )
    out = semantic_decontamination(corpus, eval_set, threshold=0.9, dim=dim)
    rows = {r["vec_id"]: (r["eval_id"], r["similarity"]) for r in out.collect()}
    assert 10 in rows and rows[10][0] == 100 and rows[10][1] > 0.99
    assert 11 not in rows  # random vector: either missed or below 0.9

    # dim mismatch fails loudly at execution, same contract as
    # lsh_topk (the guard rides the bucketing projection — zero extra
    # scans — so it surfaces when the plan runs, not at build time)
    import pytest as _pytest

    with _pytest.raises(Exception, match="expected dim=32"):
        semantic_decontamination(corpus, eval_set, threshold=0.9, dim=32).collect()

    # the EVAL side is guarded too: a wrong-length benchmark vector
    # must error loudly, not silently report "no contamination"
    bad_eval = spark.createDataFrame(
        [(100, base[:32])], ["eval_id", "eval_emb"]
    )
    with _pytest.raises(Exception, match="expected dim="):
        semantic_decontamination(corpus, bad_eval, threshold=0.9, dim=dim).collect()
