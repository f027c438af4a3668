"""Dump `.explain("formatted")` for named registry queries to files.

Optimization-round evidence tool: captures the FORMATTED physical plan
of each named query (pre-execution, i.e. the AQE initial plan — the
shape the static planner chose) into ``plans/<round>/<query>_<tag>.txt``
so before/after plan claims in OPTIMIZATION_r<N>.md are checkable
without running Spark.

Usage: python tools/explain_dump.py <round-dir> <tag> <query> [query ...]
       python tools/explain_dump.py <round-dir> <tag> --top N   (N slowest from BENCH_DETAIL.json)

e.g.   python tools/explain_dump.py r14 before ivf_pq_search
"""

from __future__ import annotations

import io
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark import get_spark  # noqa: E402


def main() -> None:
    if len(sys.argv) < 4:
        print(__doc__)
        raise SystemExit(2)
    round_dir, tag = sys.argv[1], sys.argv[2]
    out_dir = os.path.join(REPO, "plans", round_dir)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[3:]
    if names[:1] == ["--top"]:
        n = int(names[1])
        with open(os.path.join(REPO, "BENCH_DETAIL.json")) as fh:
            d = json.load(fh)
        qs = {k: v for k, v in d["queries"].items() if isinstance(v, (int, float))}
        names = [k for k, _ in sorted(qs.items(), key=lambda kv: -kv[1])[:n]]
    spark = get_spark("explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
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
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {name} @ {sf_dir} ({tag})\n\n{text}")
        print(f"wrote {path} ({len(text)} chars)")


if __name__ == "__main__":
    main()
