"""Unit tests: exact two-sample KS drift statistic."""

from __future__ import annotations

from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.drift import (
    ks_drift,
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "g string, s boolean, v double")
    return {
        r.g: r for r in ks_drift(df, ["g"], "v", sample_a=F.col("s")).collect()
    }


def test_ks_zero_for_identical_samples(spark):
    rows = [("g", s, float(v)) for s in (True, False) for v in (1, 2, 3, 4)]
    r = _run(spark, rows)["g"]
    assert (r.n_a, r.n_b, r.ks) == (4, 4, 0.0)


def test_ks_one_for_disjoint_supports(spark):
    rows = [("g", True, float(v)) for v in (1, 2)] + [
        ("g", False, float(v)) for v in (10, 20)
    ]
    assert _run(spark, rows)["g"].ks == 1.0


def test_ks_matches_hand_computation(spark):
    # A = {1,2,3,4}, B = {3,4,5,6}: max CDF gap is 0.5 (at v=2)
    rows = [("g", True, float(v)) for v in (1, 2, 3, 4)] + [
        ("g", False, float(v)) for v in (3, 4, 5, 6)
    ]
    assert _run(spark, rows)["g"].ks == 0.5


def test_ks_null_when_one_sample_empty(spark):
    rows = [("g", True, 1.0), ("g", True, 2.0)]
    r = _run(spark, rows)["g"]
    assert r.ks is None and r.n_b == 0


def test_psi_zero_for_identical_and_large_for_shifted(spark):
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.drift import (
        psi_drift,
    )

    same = [("g", s, float(v)) for s in (True, False) for v in (50, 150, 250, 350)]
    df = spark.createDataFrame(same, "g string, s boolean, v double")
    [r] = psi_drift(df, ["g"], "v", sample_a=F.col("s")).collect()
    assert r.psi == 0.0

    shifted = [("g", True, float(v)) for v in (50, 50, 150, 150)] + [
        ("g", False, float(v)) for v in (50, 150, 150, 150)
    ]
    df2 = spark.createDataFrame(shifted, "g string, s boolean, v double")
    [r2] = psi_drift(df2, ["g"], "v", sample_a=F.col("s")).collect()
    # hand: bin0 pa=.5 pb=.25, bin1 pa=.5 pb=.75
    import math
    expect = (0.5 - 0.25) * math.log(0.5 / 0.25) + (0.5 - 0.75) * math.log(0.5 / 0.75)
    assert abs(r2.psi - round(expect, 6)) < 2e-6
    assert r2.psi > 0.2  # flags as significant shift
