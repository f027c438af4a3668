"""Physical-plan inspection helpers.

Performance properties (broadcast vs shuffle, pushdown, codegen) are
CONTRACTS here, not accidents — these helpers let tests pin them so a
refactor that silently degrades the plan (e.g. a filter no longer
reaching the parquet scan, a dim join falling back to sort-merge)
fails CI instead of surfacing as a 10× regression at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Executed-plan string, truncated at AQE's '== Initial Plan =='
    section (the pre-adaptive plan would double-count every node)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def count_shuffles(df: DataFrame) -> int:
    """Number of DISTINCT shuffle exchanges (broadcast exchanges move
    the small side, not the data — they don't count). AQE final plans
    print each exchange under both its query stage and its reuse
    sites, so nodes are deduplicated by plan_id."""
    import re

    plan = physical_plan(df)
    ids = set()
    unnumbered = 0
    for line in plan.split("\n"):
        if "Exchange " in line and "BroadcastExchange" not in line:
            m = re.search(r"\[plan_id=(\d+)\]", line)
            if m:
                ids.add(m.group(1))
            else:
                unnumbered += 1
    return len(ids) + unnumbered


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan's PushedFilters mentions ``fragment``."""
    plan = physical_plan(df)
    for line in plan.split("\n"):
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names the parquet scan actually reads (ReadSchema) —
    asserts column pruning."""
    import re

    plan = physical_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols.extend(p.split(":")[0].strip() for p in m.group(1).split(",") if p.strip())
    return cols


def whole_stage_codegen_ids(df: DataFrame, execute: bool = True) -> int:
    """Number of ``*(n)`` whole-stage-codegen spans in the FINAL plan.

    Under AQE the final plan (with codegen annotations) only exists
    after THIS dataframe's own plan has executed — ``df.count()`` would
    run a different (count-aggregated) plan, so we ``collect()``.
    """
    if execute:
        df.collect()
    plan = physical_plan(df)
    return plan.count("*(")


def formatted_plan(df: DataFrame) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()
