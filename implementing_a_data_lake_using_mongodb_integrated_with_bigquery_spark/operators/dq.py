"""Declarative data-quality expectation suite.

The reference scatters its integrity checks across ad-hoc scripts: a
count reconciliation (``src/validate.py``), FK existence probes before
inserts (``src/ingest_weather_data.py:60-62``), and manual duplicate
audits (SURVEY.md §2.5 A1/A2). This operator folds that pattern into
one declarative surface: a rule set evaluated into a
``(rule, n_checked, n_violations, ok)`` report — the dbt-tests /
Great-Expectations shape, expressed relationally.

Scale shape: ALL row-local rules (null / range / set / regex) compile
into conditional aggregates of a SINGLE scan — one map-side-combined
reduction no matter how many rules; adding a rule adds zero passes.
Single-column uniqueness folds into the same pass as
``count(col) - count(distinct col)``. Referential rules each cost one
broadcast (small dim) or shuffle (large dim) anti-join-style probe —
expressed as an IN-subquery-equivalent join so Catalyst picks the
strategy. No Python, no collect; the report is a DataFrame union of
one-row aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expectations_report(
    df: DataFrame,
    row_rules: dict[str, Column],
    unique_rules: dict[str, str] | None = None,
    fk_rules: dict[str, tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Evaluate expectations into (rule, n_checked, n_violations, ok).

    ``row_rules``: rule name → VIOLATION predicate (true/null-for-
    unknown rows count as written: a NULL predicate counts as no
    violation, so pair regex/range rules with an explicit not-null
    rule when NULL itself is illegal). ``unique_rules``: rule name →
    column whose non-null values must be unique. ``fk_rules``: rule
    name → (fk column, dimension DataFrame, dimension key) — NULL or
    unmatched foreign keys are violations.
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    names: list[str] = []
    for name, pred in row_rules.items():
        names.append(name)
        aggs.append(
            F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(f"_v_{name}")
        )
    for name, col in (unique_rules or {}).items():
        names.append(name)
        aggs.append(
            (F.count(F.col(col)) - F.count_distinct(F.col(col)))
            .cast("long")
            .alias(f"_v_{name}")
        )
    wide = df.agg(*aggs)
    stack_args = ", ".join(f"'{n}', _v_{n}" for n in names)
    report = wide.select(
        F.expr(f"stack({len(names)}, {stack_args}) as (rule, n_violations)"),
        F.col("_n").alias("n_checked"),
    )

    for name, (fk_col, dim, dim_key) in (fk_rules or {}).items():
        matched = df.select(F.col(fk_col)).join(
            dim.select(F.col(dim_key).alias(fk_col)).distinct(),
            fk_col,
            "left_semi",
        )
        probe = df.agg(F.count(F.lit(1)).cast("long").alias("n_checked")).crossJoin(
            matched.agg(F.count(F.lit(1)).cast("long").alias("_n_ok"))
        )
        report = report.unionByName(
            probe.select(
                F.lit(name).alias("rule"),
                (F.col("n_checked") - F.col("_n_ok")).alias("n_violations"),
                "n_checked",
            )
        )

    return report.select(
        "rule", "n_checked", "n_violations", (F.col("n_violations") == 0).alias("ok")
    )
