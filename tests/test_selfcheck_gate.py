"""Regression tests for the selfcheck type-lint gate.

Round 3 shipped two oracles whose uncast ``SUM(BIGINT)`` returned
DuckDB HUGEINT (Arrow ``decimal128(38,0)``); the driver hash-failed
them while ``tools/selfcheck.py`` passed, because ``fetchall()``
coerces HUGEINT to Python int. These tests prove the new
``lint_result_types`` gate catches exactly that class — red on the
uncast aggregate, green on the repo-convention ``CAST(... AS
BIGINT)`` form — without needing a SparkSession.
"""

import duckdb

from tools.selfcheck import lint_result_types


def _arrow_schema(sql):
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES (1::BIGINT), (2::BIGINT)) v(x)")
    return con.execute(sql).arrow().schema


def test_uncast_sum_is_flagged():
    schema = _arrow_schema("SELECT SUM(x) AS total FROM t")
    problems = lint_result_types([("total", "bigint")], schema)
    assert len(problems) == 1
    assert "total" in problems[0] and "decimal128" in problems[0]


def test_cast_sum_passes():
    schema = _arrow_schema("SELECT CAST(SUM(x) AS BIGINT) AS total FROM t")
    assert lint_result_types([("total", "bigint")], schema) == []


def test_decimal_on_both_sides_allowed():
    schema = _arrow_schema("SELECT SUM(x) AS total FROM t")
    assert lint_result_types([("total", "decimal(38,0)")], schema) == []


def test_window_sum_output_is_flagged():
    # SUM(...) OVER also promotes to HUGEINT in DuckDB — the lint must
    # catch it when it reaches the output schema uncast.
    schema = _arrow_schema("SELECT SUM(x) OVER () AS running FROM t")
    problems = lint_result_types([("running", "bigint")], schema)
    assert len(problems) == 1 and "running" in problems[0]
