"""Round-5 additions: exact linear-algebra moments (mapInArrow /
applyInArrow) and degree-ordered triangle counting."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.graph import (
    triangle_count,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.linalg import (
    covariance_pairs,
    grouped_moments,
    top_covariant_pairs,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.text import (
    vocab_coverage,
)


def _summary(df):
    return {r: getattr(df.collect()[0], r) for r in df.columns}


def test_triangle_count_k4_plus_noise(spark):
    # K4 on {1,2,3,4} = 4 triangles; dangling edge 4-5; self-loop and
    # duplicate/reversed edges must collapse.
    edges = [(1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (5, 5), (3, 2)]
    df = spark.createDataFrame(edges, ["s", "d"])
    out = _summary(triangle_count(df, "s", "d"))
    assert out == {"n_nodes": 5, "n_edges": 7, "n_triangles": 4}


def test_triangle_count_hub_star_has_no_triangles(spark):
    # star = hub with 50 leaves: degree orientation must not blow up
    # and the count is 0 (no closing edges)
    edges = [(0, i) for i in range(1, 51)]
    df = spark.createDataFrame(edges, ["s", "d"])
    out = _summary(triangle_count(df, "s", "d"))
    assert out == {"n_nodes": 51, "n_edges": 50, "n_triangles": 0}


def test_triangle_count_wheel(spark):
    # cycle of 6 around a hub: every rim edge closes one triangle with
    # the hub -> 6 triangles, and the hub has max degree (orientation
    # points rim->hub)
    rim = [(i, i % 6 + 1) for i in range(1, 7)]
    spokes = [(0, i) for i in range(1, 7)]
    df = spark.createDataFrame(rim + spokes, ["s", "d"])
    out = _summary(triangle_count(df, "s", "d"))
    assert out == {"n_nodes": 7, "n_edges": 12, "n_triangles": 6}


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.default_rng(7)
    rows = [
        (i, [float(x) for x in rng.normal(size=8)], int(i % 3))
        for i in range(40)
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def _quant(rows):
    return np.floor(np.array(rows, dtype=np.float64) * 10_000).astype(np.int64)


def test_covariance_pairs_match_numpy(spark, vec_df):
    x = _quant([r.embedding for r in vec_df.orderBy("vec_id").collect()])
    got = {
        (r.i, r.j): (r.n_rows, r.sx, r.sy, r.sxy)
        for r in covariance_pairs(vec_df, "embedding", 8).collect()
    }
    gram = x.T @ x
    sums = x.sum(axis=0)
    assert len(got) == 8 * 9 // 2
    for (i, j), (n, sx, sy, sxy) in got.items():
        assert i <= j
        assert (n, sx, sy, sxy) == (40, sums[i], sums[j], gram[i, j])


def test_covariance_partition_invariant(spark, vec_df):
    base = covariance_pairs(vec_df, "embedding", 8)
    shuffled = covariance_pairs(vec_df.repartition(7, "label"), "embedding", 8)
    assert sorted(map(tuple, base.collect())) == sorted(
        map(tuple, shuffled.collect())
    )


def test_covariance_dim_mismatch_fails_fast(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])], ["vec_id", "embedding"]
    )
    with pytest.raises(Exception, match="expected embedding dim"):
        covariance_pairs(df, "embedding", 2).collect()


def test_top_covariant_pairs_off_diagonal_ranked(spark, vec_df):
    out = top_covariant_pairs(vec_df, "embedding", 8, k=5).collect()
    assert len(out) == 5
    mags = [abs(r.cov_num) for r in out]
    assert mags == sorted(mags, reverse=True)
    assert all(r.dim_i < r.dim_j for r in out)


def test_grouped_moments_match_numpy(spark, vec_df):
    rows = vec_df.orderBy("vec_id").collect()
    got = {
        (r.label, r.dim): (r.n_vecs, r.sx, r.sxx)
        for r in grouped_moments(vec_df, "label", "embedding", 8).collect()
    }
    assert len(got) == 3 * 8
    for lbl in range(3):
        x = _quant([r.embedding for r in rows if r.label == lbl])
        for d in range(8):
            assert got[(lbl, d)] == (
                x.shape[0],
                x[:, d].sum(),
                (x[:, d] ** 2).sum(),
            )


def test_vocab_coverage_small(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a b", "s1"),
            (2, "a b  c", "s1"),  # double space -> empty token dropped
            (3, "z z q", "s2"),
        ],
        ["doc_id", "text", "source"],
    )
    # k=2 vocab by (count desc, token asc): a(3), b(2) -- z(2) loses
    # the tie to b alphabetically
    out = {r.source: r for r in vocab_coverage(docs, "text", "source", k=2).collect()}
    assert out["s1"].n_tokens == 6 and out["s1"].n_oov == 1  # only c
    assert out["s1"].oov_permille == 166
    assert out["s2"].n_tokens == 3 and out["s2"].n_oov == 3
    assert out["s2"].oov_permille == 1000
    assert out["s1"].n_unique == 3 and out["s2"].n_unique == 2


def test_bpe_apply_marker_framing(spark):
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.text import (
        bpe_apply_tokens,
    )

    docs = spark.createDataFrame(
        [
            # 'the' chains (t,h) then (th,e); 'thth' has ADJACENT
            # occurrences and both must merge (disjoint self-delimited
            # matches); 'Ab1' is filtered (non-alpha)
            (1, "the thth Ab1"),
        ],
        ["doc_id", "text"],
    )
    toks = sorted(r.tok for r in bpe_apply_tokens(docs, "text").collect())
    assert toks == sorted(["the", "th", "th"])

    # the false-boundary hazard the markers exist for: after (a,b)
    # builds the symbol 'ab', rule (b,c) must NOT match the 'b' that is
    # now the SUFFIX of 'ab' — an unframed space representation would
    # rewrite 'ab c' into 'abc' here
    toks2 = sorted(
        r.tok
        for r in bpe_apply_tokens(
            docs.withColumn("text", F.lit("abc")),
            "text",
            merges=(("a", "b"), ("b", "c")),
        ).collect()
    )
    assert toks2 == ["ab", "c"]


def test_containment_catches_subset_dup(spark):
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.dedup_near import (
        containment_pairs,
    )

    short = "alpha beta gamma delta epsilon"          # 3 shingles
    long_ = short + " zeta eta theta iota kappa lam mu nu xi omicron pi"
    other = "one two three four five six seven"
    docs = spark.createDataFrame(
        [(1, short), (2, long_), (3, other)], ["doc_id", "text"]
    )
    out = {(r.src, r.dst): r for r in containment_pairs(docs).collect()}
    # short fully contained in long: C(1→2) = 3/3 = 1.0
    assert (1, 2) in out and out[(1, 2)].containment == 1.0
    assert out[(1, 2)].shared == 3 and out[(1, 2)].n_src == 3
    # the reverse direction fails the 4/5 gate (3/14 shingles)
    assert (2, 1) not in out
    # unrelated doc appears in no pair
    assert not any(3 in p for p in out)


def test_discriminative_tokens_flags_group_marker(spark):
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.text import (
        discriminative_tokens,
    )

    # 'promo' appears ONLY in s1 and often; 'the' is uniform background
    rows = [(i, "the common promo text", "s1") for i in range(30)]
    rows += [(100 + i, "the common other text", "s2") for i in range(30)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = discriminative_tokens(
        docs, "text", "source", min_token_total=10, k=2
    ).collect()
    # the two observed perfectly-discriminating cells outrank every
    # uniform token (whose chi2 is exactly 0)
    assert {(r.tok, r.source) for r in out} == {("promo", "s1"), ("other", "s2")}
    # N=240, a=30, tt=30, ss=120: chi2 = 240*3600^2/(30*210*120*120)
    assert all(r.chi2 == 34.285714 for r in out)


def test_grouped_moments_string_group_key(spark):
    df = spark.createDataFrame(
        [("a", [1.0, 2.0]), ("a", [3.0, 4.0]), ("b", [5.0, 6.0])],
        ["src", "embedding"],
    )
    got = {
        (r.src, r.dim): (r.n_vecs, r.sx)
        for r in grouped_moments(df, "src", "embedding", 2).collect()
    }
    assert got[("a", 0)] == (2, 40_000) and got[("a", 1)] == (2, 60_000)
    assert got[("b", 0)] == (1, 50_000) and got[("b", 1)] == (1, 60_000)


def test_covariance_pairs_empty_input(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert covariance_pairs(df, "embedding", 4).count() == 0
