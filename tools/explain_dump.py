"""Dump `.explain("formatted")` for named registry queries to files.

Optimization-round evidence tool: captures the FORMATTED physical plan
of each named query (pre-execution, i.e. the AQE initial plan — the
shape the static planner chose) into ``plans/r13/<query>_<tag>.txt``
so before/after plan claims in OPTIMIZATION_r13.md are checkable
without running Spark.

Usage: python tools/explain_dump.py <tag> <query> [query ...]
       python tools/explain_dump.py <tag> --top N   (N slowest from BENCH_DETAIL.json)
"""

from __future__ import annotations

import io
import json
import os
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark import get_spark

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")


def main() -> None:
    tag = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[2:]
    if names[:1] == ["--top"]:
        n = int(names[1])
        with open("/root/repo/BENCH_DETAIL.json") as fh:
            d = json.load(fh)
        qs = {k: v for k, v in d["queries"].items() if isinstance(v, (int, float))}
        names = [k for k, _ in sorted(qs.items(), key=lambda kv: -kv[1])[:n]]
    spark = get_spark("explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)
    qs = entrymod.queries()
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            stdout, sys.stdout = sys.stdout, buf
            try:
                df.explain("formatted")
            finally:
                sys.stdout = stdout
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            text = f"ERROR building {name}: {type(exc).__name__}: {exc}\n"
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {name} @ {sf_dir} ({tag})\n\n{text}")
        print(f"wrote {path} ({len(text)} chars)")


if __name__ == "__main__":
    main()
