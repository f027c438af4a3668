"""Stage-level breakdown for ONE query: task counts and skew signal.

Runs the query twice (warm + measured) and prints, for every stage of
the measured run: numTasks, stage wall (submission→completion), total
executor run time, and the max/median task ratio where available.
``stage wall ≈ Σ task time`` means the stage ran effectively serially
(1 busy core) — the straggler/parallelism detector for guide §2.6.

Usage: python tools/profile_stages.py <sf_dir> <query>
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark import (  # noqa: E402
    get_spark,
)


def _stages(spark):
    store = spark.sparkContext._jsc.sc().statusStore()
    gw = spark.sparkContext._gateway
    quantiles = gw.new_array(gw.jvm.double, 0)
    seq = store.stageList(None, False, False, quantiles, None)
    out = {}
    it = seq.iterator()
    while it.hasNext():
        s = it.next()
        sid = s.stageId()
        sub = s.submissionTime()
        comp = s.completionTime()
        wall = None
        if sub.isDefined() and comp.isDefined():
            wall = (comp.get().getTime() - sub.get().getTime()) / 1000.0
        out[sid] = {
            "name": s.name()[:70],
            "numTasks": s.numTasks(),
            "wall": wall,
            "runTime": s.executorRunTime() / 1000.0,
            "shuffleRead": s.shuffleReadBytes(),
            "shuffleWrite": s.shuffleWriteBytes(),
            "outputRows": None,
        }
    return out


def main() -> None:
    sf_dir, name = sys.argv[1], sys.argv[2]
    qs = entrymod.queries()
    spark = get_spark("lakeflow-profile-stages")
    spark.sparkContext.setLogLevel("ERROR")
    qs[name](spark, sf_dir).collect()  # warm
    before = set(_stages(spark))
    t0 = time.time()
    qs[name](spark, sf_dir).collect()
    wall = time.time() - t0
    after = _stages(spark)
    new = {k: v for k, v in after.items() if k not in before}
    print(f"{name}: wall={wall:.2f}s, {len(new)} stages")
    print(f"{'stage':>6} {'tasks':>6} {'wall_s':>8} {'runT_s':>8} {'shRd':>10} {'shWr':>10}  name")
    for sid in sorted(new):
        s = new[sid]
        w = f"{s['wall']:.2f}" if s["wall"] is not None else "-"
        print(
            f"{sid:>6} {s['numTasks']:>6} {w:>8} {s['runTime']:>8.2f} "
            f"{s['shuffleRead']:>10} {s['shuffleWrite']:>10}  {s['name']}"
        )


if __name__ == "__main__":
    main()
