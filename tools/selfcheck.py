"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB at the given SF, then compares row count, sorted column
names, and (column-name-sorted, row-sorted) values exactly. Catches
hash mismatches before the driver does.

Also lints the DuckDB result's *Arrow* schema: the driver hashes the
oracle result through Arrow, so a DuckDB HUGEINT output column
(``SUM(BIGINT)`` uncast) surfaces as ``decimal128(38,0)`` and
hash-mismatches an int64 Spark column even when every value is equal
(round-3 failure mode: ``corpus_curation``, ``train_split_stats``).
``fetchall()`` coerces HUGEINT to Python int and hides this, so the
value comparison alone is blind to it — ``lint_result_types`` fails
any decimal-typed oracle column whose Spark twin is not DecimalType.

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entrymod
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark import get_spark
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources.tables import TABLES


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bool):
        return str(v)
    return v


def lint_result_types(spark_dtypes, arrow_schema):
    """Driver-parity type lint.

    ``spark_dtypes``: list of (name, simpleString) pairs from
    ``DataFrame.dtypes``. ``arrow_schema``: ``pyarrow.Schema`` of the
    DuckDB oracle result. Returns a list of problem strings.

    Hard failure: ANY decimal column in an EMITTED result schema, on
    EITHER engine. The r3 class was an uncast DuckDB HUGEINT whose
    Spark twin was bigint; the r11 class was both-sides DECIMAL(38,0)
    outputs — values equal, local fetchall/collect comparison
    normalizes Decimal and passes, but the driver's Arrow value-hash
    of decimal128 differs and all three such queries went hash-red
    (cms_join_size, spearman_rank_correlation, pq_codebook_audit).
    Convention (registry module docstring): keep DECIMAL/HUGEINT
    accumulators internal, emit BIGINT (documented margin) or STRING
    of the scale-0 decimal.
    """
    import pyarrow.types as pat

    sd = {n: t for n, t in spark_dtypes}
    problems = []
    for n, t in spark_dtypes:
        if t.startswith("decimal"):
            problems.append(
                f"spark col {n!r} is {t}: decimal OUTPUT columns are "
                f"driver-hash-unsafe (r11 regression) — keep the decimal "
                f"accumulator internal and emit BIGINT or CAST(... AS STRING)"
            )
    for field in arrow_schema:
        st = sd.get(field.name)
        if pat.is_decimal(field.type):
            problems.append(
                f"oracle col {field.name!r} is {field.type} (HUGEINT/DECIMAL?)"
                f"{'' if st is None else f' (spark twin is {st})'}: decimal "
                f"OUTPUT columns are driver-hash-unsafe — cast the aggregate "
                f"(CAST(... AS BIGINT) or CAST(... AS VARCHAR))"
            )
    return problems


def rows_key(rows, cols_order):
    out = []
    for r in rows:
        d = dict(zip(cols_order, r))
        out.append(tuple(norm(d[c]) for c in sorted(cols_order)))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?  {name}: rows={len(s_rows)} (no oracle, rows-only) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(sql)
            d_cols = [c[0] for c in res.description]
            d_rows = res.fetchall()
            d_arrow_schema = con.execute(sql).arrow().schema
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failed.append(name)
            continue
        problems = lint_result_types(sdf.dtypes, d_arrow_schema)
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if not problems:
            sk, dk = rows_key(s_rows, s_cols), rows_key(d_rows, d_cols)
            if sk != dk:
                bad = next(
                    (i, a, b) for i, (a, b) in enumerate(zip(sk, dk)) if a != b
                ) if len(sk) == len(dk) else None
                problems.append(f"values differ; first diff: {bad}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failed.append(name)
        else:
            print(f"PASS {name}: rows={len(s_rows)} [{time.time()-t0:.1f}s]")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
