"""Smoke + sanity for every registered query at sf0.001.

Full DuckDB-oracle equivalence is exercised by ``tools/selfcheck.py``
(and the driver at sf0.01); here we pin row-level sanity cheaply.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources.tables import TABLES


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle_rowcount(spark, sf_dir, duck, name):
    fn = entrymod.queries()[name]
    df = fn(spark, sf_dir)
    n_spark = df.count()
    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        assert n_spark >= 0
        return
    n_duck = duck.execute(f"SELECT COUNT(*) FROM ({sql})").fetchone()[0]
    assert n_spark == n_duck
    # schema contract: column names match the oracle's
    d_cols = [c[0] for c in duck.execute(sql).description]
    assert sorted(df.columns) == sorted(d_cols)


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
