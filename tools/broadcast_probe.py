"""Data-volume-dependent-broadcast audit: the one physical-plan scale
class the global-window / low-par-window / unbounded-buffer detectors
don't cover.

An explicit ``F.broadcast()`` hint is obeyed at ANY build-side size —
a hinted broadcast that is 2 MB at sf0.1 but grows with the data is an
executor OOM at 100×. AQE's auto-broadcasts are NOT that class: they
are re-planned per run from runtime stats and capped by
``autoBroadcastJoinThreshold``, so at 100 TB the planner simply stops
choosing them. This probe therefore runs every registry query in a
session with BOTH broadcast thresholds set to -1, so every
BroadcastExchange left in the executed plan is hint-forced, then
measures each query's hinted broadcasts at sf0.01 AND sf0.1 and flags
the ones whose runtime rows grow with SF (data-proportional) or exceed
an absolute byte ceiling.

Flag rule (pure function `classify` below, unit-pinned in
tests/test_round11.py):
  - GROWTH: max hinted-bcast rows at sf0.1 ≥ 1000 AND ≥3× the sf0.01
    max (10× the data ⇒ a domain-bounded broadcast stays ~1×, a
    data-proportional one lands ~10×; 3× splits the bands with margin
    for sampling jitter).
  - ABSOLUTE: hinted-bcast built size ≥ 64 MB at sf0.1 (fat-row guard:
    embedding tables can be huge at few rows).

Usage: python tools/broadcast_probe.py [query ...]
Writes BROADCAST_AUDIT.md + BROADCAST_AUDIT.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark import (
    get_spark,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.plans.explain import (
    broadcast_exchange_stats,
)

SF_SMALL = "/root/testdata/sf0.01"
SF_BIG = "/root/testdata/sf0.1"

GROWTH_MIN_ROWS = 1000
GROWTH_FACTOR = 3.0
ABS_MAX_BYTES = 64 << 20


def classify(
    rows_small: int,
    rows_big: int,
    bytes_big: int,
    growth_min_rows: int = GROWTH_MIN_ROWS,
    growth_factor: float = GROWTH_FACTOR,
    abs_max_bytes: int = ABS_MAX_BYTES,
) -> list[str]:
    """Flag reasons for one query's (max hinted-bcast rows @sf0.01,
    max rows @sf0.1, max bytes @sf0.1) triple; empty list = pass."""
    reasons = []
    if rows_big >= growth_min_rows and rows_big >= growth_factor * max(
        rows_small, 1
    ):
        reasons.append(
            f"data-proportional: {rows_small}→{rows_big} rows at 10× data"
        )
    if bytes_big >= abs_max_bytes:
        reasons.append(f"absolute: {bytes_big / 1e6:.1f} MB built relation")
    return reasons


def hinted_broadcast_max(qfn, spark, sf_dir) -> tuple[int, int]:
    """(max rows, max bytes) across hinted broadcast exchanges in the
    query's executed plan at sf_dir (0, 0 when none)."""
    df = qfn(spark, sf_dir)
    df.collect()
    stats = broadcast_exchange_stats(df)
    rows = max((s["rows"] or 0 for s in stats), default=0)
    size = max((s["bytes"] or 0 for s in stats), default=0)
    return rows, size


def main() -> None:
    import __spark_entry__ as entrymod

    only = sys.argv[1:]
    spark = get_spark("broadcast-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # Hint-only mode: with both thresholds off, every BroadcastExchange
    # that remains was FORCED by an explicit broadcast() hint — the
    # size-blind class this audit exists for.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    qs = entrymod.queries()
    items = sorted(qs.items())
    if only:
        items = [(n, f) for n, f in items if n in only]
    results = {}
    flagged = []
    for name, fn in items:
        try:
            r01, b01 = hinted_broadcast_max(fn, spark, SF_SMALL)
            if r01 == 0 and b01 == 0:
                # no hinted broadcast at all — nothing to grow
                results[name] = {"rows_sf001": 0, "skip": "no hinted bcast"}
                continue
            r1, b1 = hinted_broadcast_max(fn, spark, SF_BIG)
            reasons = classify(r01, r1, b1)
            results[name] = {
                "rows_sf001": r01,
                "rows_sf01": r1,
                "mb_sf01": round(b1 / 1e6, 2),
                "flags": reasons,
            }
            if reasons:
                flagged.append(name)
            print(name, results[name])
        except Exception as exc:  # noqa: BLE001 — record and keep going
            results[name] = {"err": f"{type(exc).__name__}: {exc}"[:300]}
            print(name, results[name])
    # Subset runs MERGE into the existing audit instead of clobbering
    # it (r12 lesson, same as scale_probe): a 3-query probe must not
    # replace the 358-row artifact. Flags are recomputed over the
    # merged result set; the regenerated md below reflects the merge.
    path = "/root/repo/BROADCAST_AUDIT.json"
    if only and os.path.exists(path):
        with open(path) as fh:
            prior = json.load(fh)
        merged = dict(prior.get("queries", {}))
        merged.update(results)
        results = merged
        flagged = sorted(
            n for n, r in results.items() if r.get("flags")
        )
    with open(path, "w") as fh:
        json.dump({"flagged": flagged, "queries": results}, fh, indent=1)
    lines = [
        "# BROADCAST_AUDIT — hint-forced broadcast growth probe",
        "",
        "Generated by `tools/broadcast_probe.py`. Session runs with",
        "`spark.sql.autoBroadcastJoinThreshold=-1` and",
        "`spark.sql.adaptive.autoBroadcastJoinThreshold=-1`, so every",
        "BroadcastExchange in the executed plans below is forced by an",
        "explicit `broadcast()` hint — the size-blind class that OOMs",
        "executors at 100× if its build side grows with the data. Each",
        "hinted query ran at sf0.01 AND sf0.1 (10× data): a",
        "domain-bounded broadcast stays ~1× in rows, a",
        "data-proportional one lands ~10×; the flag threshold is 3×",
        "(with a 1000-row floor) or a 64 MB absolute build size.",
        "",
        f"**Flagged: {flagged if flagged else 'none'}**",
        "",
        "| query | hinted bcast rows @0.01 | rows @0.1 | MB @0.1 | flags |",
        "|---|---|---|---|---|",
    ]
    for name, r in sorted(results.items()):
        if "skip" in r or "err" in r:
            continue
        lines.append(
            f"| {name} | {r['rows_sf001']} | {r['rows_sf01']} |"
            f" {r['mb_sf01']} | {'; '.join(r['flags']) or '—'} |"
        )
    n_skip = sum(1 for r in results.values() if "skip" in r)
    n_err = sum(1 for r in results.values() if "err" in r)
    lines += [
        "",
        f"{n_skip} queries have no hinted broadcast (skipped);"
        f" {n_err} errored.",
        "",
    ]
    with open("/root/repo/BROADCAST_AUDIT.md", "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote BROADCAST_AUDIT.md ({len(flagged)} flagged)")


if __name__ == "__main__":
    main()
