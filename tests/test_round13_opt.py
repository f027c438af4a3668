"""Round-13 optimization-round pins.

The r13-opt rewrite collapsed the similarity family's per-centroid
literal loops into single array-literal transforms
(``similarity.py:_int_arr_lit/_int_mat_lit``) purely for Catalyst
PLANNING time — values must be bit-identical. These tests pin the
rewritten expressions against independent pure-Python recomputation of
the exact integer convention (floor(x·1e6) scaling, argmin with
first-index tiebreak, sign-LSH bit weights), so a future refactor that
nudges tiebreaks, scaling, or the lambda-arity closure (the
``lambda c, _sub=sub:`` trap — PySpark binds the extra arg to the int
INDEX) fails here instead of flaking a driver hash.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.similarity import (
    hyperplane_code,
    hyperplanes,
    int_centroid_assign,
    pq_codebooks,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources.tables import (
    load_table,
)

SF_DIR = "/root/testdata/sf0.001"
DIM = 64


def _ints(vec):
    return [math.floor(float(x) * 1000000.0) for x in vec]


def test_int_centroid_assign_matches_python_argmin(spark):
    cents = pq_codebooks(1, 8, DIM)[0]
    emb = load_table(spark, SF_DIR, "embeddings").limit(200)
    rows = emb.select(
        "vec_id",
        "embedding",
        int_centroid_assign(F.col("embedding"), cents, DIM, "t").alias("cell"),
    ).collect()
    assert rows
    for r in rows:
        e = _ints(r["embedding"])
        dists = [sum((a - b) * (a - b) for a, b in zip(e, c)) for c in cents]
        # argmin with FIRST-index tiebreak — the engine-exact contract
        want = dists.index(min(dists))
        assert r["cell"] == want, (r["vec_id"], r["cell"], want)


def test_hyperplane_code_matches_python_bits(spark):
    planes = hyperplanes(4, DIM)
    emb = load_table(spark, SF_DIR, "embeddings").limit(200)
    rows = emb.select(
        "vec_id",
        "embedding",
        hyperplane_code(F.col("embedding"), planes).alias("code"),
    ).collect()
    assert rows
    seen = set()
    for r in rows:
        e = _ints(r["embedding"])
        want = 0
        for bit, h in enumerate(planes):
            if sum(a * b for a, b in zip(e, h)) > 0:
                want += 1 << bit
        assert r["code"] == want, (r["vec_id"], r["code"], want)
        seen.add(want)
    # the corpus must spread over multiple buckets or LSH is degenerate
    assert len(seen) > 1


def test_assign_plan_has_one_lambda_set_not_k(spark):
    """The point of the rewrite: ONE transform/zip_with/aggregate
    lambda set over the codebook matrix instead of one aggregate
    expression PER centroid. (The matrix itself still prints as
    CreateArray in the analyzed plan — PySpark's ``lit(list)``
    delegates to ``array(...)`` — but CreateArray-of-literals is
    foldable and collapses to a single Literal in optimization; the
    planning cost that measured 5.9 s driver-side on ivf_pq_search was
    the k× lambda machinery.) Pin: the 8-centroid assign must carry a
    HANDFUL of lambdafunctions, not ~3 per centroid."""
    cents = pq_codebooks(1, 8, DIM)[0]
    emb = load_table(spark, SF_DIR, "embeddings").limit(5)
    df = emb.select(
        int_centroid_assign(F.col("embedding"), cents, DIM, "t").alias("cell")
    )
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "transform(" in plan
    # old form: 8 aggregates × (zip_with + 2 aggregate lambdas) ≥ 24;
    # new form measures 10 (one transform set + the ints() scaling)
    assert plan.count("lambdafunction(") <= 12, plan.count("lambdafunction(")
    # and the folded matrix is a single Literal in the optimized plan
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("array(array(") == 0


@pytest.mark.parametrize("bad_arity", [True])
def test_transform_index_binding_would_be_caught(spark, bad_arity):
    """Regression for the lambda-arity trap: a two-arg lambda gets
    (element, index), so zip_with against the int index must fail
    analysis loudly (this is what the default-arg closure hit)."""
    from pyspark.sql.utils import AnalysisException

    emb = load_table(spark, SF_DIR, "embeddings").limit(1)
    mat = F.lit([[1, 2], [3, 4]]).cast("array<array<bigint>>")
    e = F.transform("embedding", lambda x: x.cast("long"))
    bad = F.transform(
        mat,
        lambda c, idx: F.aggregate(
            F.zip_with(idx, c, lambda a, b: a * b),  # idx is INT, not array
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    with pytest.raises(AnalysisException):
        emb.select(bad.alias("x")).collect()
    # and the correct closure form resolves fine
    good = F.transform(
        mat,
        lambda c: F.aggregate(
            F.zip_with(F.slice(e, 1, 2), c, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    assert emb.select(good.alias("x")).count() == 1
