"""Regression tests for the selfcheck type-lint gate.

Round 3 shipped two oracles whose uncast ``SUM(BIGINT)`` returned
DuckDB HUGEINT (Arrow ``decimal128(38,0)``); the driver hash-failed
them while ``tools/selfcheck.py`` passed, because ``fetchall()``
coerces HUGEINT to Python int. Round 11 shipped the INVERSE class:
three queries emitting DECIMAL(38,0) on BOTH engines (values equal,
local comparison normalizes Decimal) hash-failed the driver's Arrow
value-hash. These tests prove ``lint_result_types`` catches both
classes — red on ANY decimal output column on EITHER engine, green
on the repo-convention ``CAST(... AS BIGINT)`` / ``CAST(... AS
VARCHAR)`` forms — without needing a SparkSession.
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


def test_decimal_on_both_sides_flagged():
    # The r11 regression class: both engines agree the column is
    # DECIMAL(38,0) and on its values, yet the driver's Arrow
    # value-hash of decimal128 diverges — the lint must go red on
    # BOTH sides, not just the mismatch.
    schema = _arrow_schema("SELECT SUM(x) AS total FROM t")
    problems = lint_result_types([("total", "decimal(38,0)")], schema)
    assert len(problems) == 2  # spark-side AND oracle-side flags
    assert any("spark col" in p for p in problems)
    assert any("oracle col" in p for p in problems)


def test_spark_only_decimal_output_flagged():
    # Even with a non-decimal oracle twin, a Spark decimal output is
    # driver-hash-unsafe on its own.
    schema = _arrow_schema("SELECT CAST(SUM(x) AS BIGINT) AS total FROM t")
    problems = lint_result_types([("total", "decimal(38,0)")], schema)
    assert len(problems) == 1 and "spark col" in problems[0]


def test_string_of_decimal_passes():
    # The r12 convention for 100TB-exact outputs: STRING of the
    # scale-0 decimal on both engines.
    schema = _arrow_schema("SELECT CAST(SUM(x) AS VARCHAR) AS total FROM t")
    assert lint_result_types([("total", "string")], schema) == []


def test_window_sum_output_is_flagged():
    # SUM(...) OVER also promotes to HUGEINT in DuckDB — the lint must
    # catch it when it reaches the output schema uncast.
    schema = _arrow_schema("SELECT SUM(x) OVER () AS running FROM t")
    problems = lint_result_types([("running", "bigint")], schema)
    assert len(problems) == 1 and "running" in problems[0]
