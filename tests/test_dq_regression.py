"""Unit tests: data-quality expectation suite and grouped OLS."""

from __future__ import annotations

from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.dq import (
    expectations_report,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.regression import (
    grouped_linreg,
)


def test_expectations_report_counts_each_rule_kind(spark):
    rows = [
        (1, 10.0, "F"),
        (2, -5.0, "F"),     # range violation
        (2, 20.0, "X"),     # domain violation + duplicate id
        (None, 30.0, "O"),  # null id (also null FK)
    ]
    df = spark.createDataFrame(rows, "id bigint, price double, status string")
    dim = spark.createDataFrame([(1,), (2,)], ["k"])
    rep = {
        r.rule: r
        for r in expectations_report(
            df,
            row_rules={
                "not_null_id": F.col("id").isNull(),
                "status_domain": ~F.col("status").isin("F", "O"),
                "positive_price": F.col("price") <= 0,
            },
            unique_rules={"unique_id": "id"},
            fk_rules={"fk_id": ("id", dim, "k")},
        ).collect()
    }
    assert all(r.n_checked == 4 for r in rep.values())
    assert rep["not_null_id"].n_violations == 1 and not rep["not_null_id"].ok
    assert rep["status_domain"].n_violations == 1
    assert rep["positive_price"].n_violations == 1
    assert rep["unique_id"].n_violations == 1  # 3 non-null ids, 2 distinct
    assert rep["fk_id"].n_violations == 1  # the NULL fk row
    assert not rep["fk_id"].ok


def test_expectations_report_all_green(spark):
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id bigint, v double")
    rep = expectations_report(
        df,
        row_rules={"positive": F.col("v") <= 0},
        unique_rules={"unique_id": "id"},
    )
    assert all(r.ok and r.n_violations == 0 for r in rep.collect())


def test_grouped_linreg_recovers_exact_line(spark):
    rows = [("a", x, 2.0 * x + 1.0) for x in range(10)]
    df = spark.createDataFrame(rows, "g string, x bigint, y double")
    [r] = grouped_linreg(df, ["g"], F.col("x"), F.col("y")).collect()
    assert (r.slope, r.intercept, r.r2) == (2.0, 1.0, 1.0)
    assert r.n == 10


def test_grouped_linreg_matches_numpy(spark):
    import numpy as np

    rng = [(i * 37) % 11 for i in range(40)]  # deterministic pseudo-noise
    rows = [("g", x, 0.5 * x - 3.0 + 0.01 * n) for x, n in zip(range(40), rng)]
    df = spark.createDataFrame(rows, "g string, x bigint, y double")
    [r] = grouped_linreg(df, ["g"], F.col("x"), F.col("y"), y_scale=10000).collect()
    xs = np.array([x for _, x, _ in rows], dtype=float)
    # the operator quantizes y to 1/y_scale units first — compare
    # against numpy on the SAME quantized values
    ys = np.round(np.array([y for _, _, y in rows]) * 10000) / 10000
    slope, intercept = np.polyfit(xs, ys, 1)
    assert abs(r.slope - slope) < 1e-6
    assert abs(r.intercept - intercept) < 1e-6
    assert 0.99 < r.r2 <= 1.0
