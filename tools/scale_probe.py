"""Scale demonstration: build a scratch ~sf1 replica (10× key-remapped
unions of the sf0.1 fixtures — `/root/testdata` is read-only, so the
replica lives in a scratch dir) and run the heaviest registry queries
against it, recording runtime evidence that the plans behave at 10×:
wall time, the LARGEST single reduce-partition (max task shuffle
input, from each shuffle stage's `mapStats`), and total shuffle bytes.

Key remapping: every key/FK column referencing a REPLICATED table is
shifted by copy_index × 10^12, so the keyspace grows 10× with FK
validity preserved. Dimension tables (nation/region) are copied
verbatim — their FKs (c_nationkey, s_nationkey) stay in range.
Timestamps are left unshifted: windows get ~10× denser, which is the
scale-up being demonstrated. Text/embeddings repeat verbatim, so the
dedup/ANN families face a 10-way exact-duplicate stress — the
dup-heavy regime those operators exist for.

Usage: python tools/scale_probe.py [out_dir] [--copies N] [query ...]
Writes SCALE_SF{N/10}.json next to the repo root (SCALE_SF1.json for
the default 10 copies; --copies 30 → SCALE_SF3.json — the 30×-row
probe that validates the O(√E) wedge-join bound where it actually
bends instead of interpolating the 100× claim from 10×).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark import get_spark
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.plans.explain import (
    _plan_children,
    broadcast_exchange_stats,
)

SRC = "/root/testdata/sf0.1"
COPIES = 10
OFF = 10**12

# key/FK columns to shift per table (columns referencing nation/region
# are deliberately absent — those dims are not replicated)
KEYMAP: dict[str, list[str]] = {
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "nation": [],
    "region": [],
}

DEFAULT_QUERIES = [
    # top-30 heaviest from the fresh r11 BENCH_DETAIL baseline — full
    # coverage of the expensive set (VERDICT r10 task 6)
    "stream_cdc_merge_replay", "local_clustering_topk",
    "copurchase_triangles", "stream_incremental_dedup",
    "stream_cdc_merge_restart", "stream_update_merge_hourly",
    "python_datasource_stream", "stream_two_level_restart",
    "stream_restart_attribution", "stream_ivf_ingest",
    "winnowing_overlap", "purchase_pagerank", "pq_recall_eval",
    "ivf_pq_search", "boilerplate_flags", "stream_dedup_then_window",
    "two_hop_reach", "kcore_copurchase", "subsample_ci_revenue",
    "stream_rocksdb_restart", "ann_ranking_quality", "ann_recall_eval",
    "mad_by_type", "stream_restart_sessions", "stream_restart_hourly",
    "association_rules", "stream_two_level_hourly",
    "stream_restart_dedup", "stream_scd2_maintenance",
    "stream_attribution_join",
    # retained r9 probe members not in the current top-30 (trend
    # continuity across rounds)
    "bpe_train_merges", "spearman_rank_correlation",
]

# The three heaviest BATCH queries get an additional 30x-row probe
# (--copies 30): the O(sqrt E) wedge-join bound and the winnowing
# prefix filter are validated where they bend, not interpolated.
SF3_QUERIES = [
    "local_clustering_topk", "copurchase_triangles", "winnowing_overlap",
]


def build_replica(out_dir: str, copies: int = COPIES) -> None:
    os.makedirs(out_dir, exist_ok=True)
    # Scale marker (r13): build_replica skips tables that already
    # exist, so reusing one dir for a DIFFERENT --copies silently
    # probes the old scale while labeling results with the new one
    # (five 30x rows were nearly recorded from 10x data). The marker
    # pins the dir's scale; a mismatch is a hard error pointing at a
    # copies-specific dir instead.
    marker = os.path.join(out_dir, "_replica_copies.json")
    if os.path.exists(marker):
        with open(marker) as fh:
            built = json.load(fh).get("copies")
        if built != copies:
            raise SystemExit(
                f"{out_dir} holds a {built}x replica but --copies "
                f"{copies} was requested — use a different out_dir "
                f"(default picks one per copies count)"
            )
    elif any(
        os.path.exists(os.path.join(out_dir, f"{t}.parquet"))
        for t in KEYMAP
    ):
        raise SystemExit(
            f"{out_dir} holds replica tables but no scale marker — "
            f"delete it or pass a fresh out_dir"
        )
    else:
        with open(marker, "w") as fh:
            json.dump({"copies": copies}, fh)
    con = duckdb.connect()
    for table, keys in KEYMAP.items():
        dst = os.path.join(out_dir, f"{table}.parquet")
        if os.path.exists(dst):
            continue
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'"
            ).fetchall()
        ]
        if not keys:
            shutil.copyfile(f"{SRC}/{table}.parquet", dst)
            continue
        parts = []
        for i in range(copies):
            sel = ", ".join(
                f"({c} + {i * OFF}) AS {c}" if c in keys else c for c in cols
            )
            parts.append(f"SELECT {sel} FROM '{SRC}/{table}.parquet'")
        union = " UNION ALL ".join(parts)
        con.execute(f"COPY ({union}) TO '{dst}' (FORMAT PARQUET)")
        print(f"built {table}: {copies}x")


def shuffle_stats(df) -> tuple[int, int]:
    """(max single reduce-partition bytes, total shuffle bytes) across
    every shuffle stage in the EXECUTED plan — max task shuffle input
    is the serialization-into-one-task detector at scale."""
    roots = [df._jdf.queryExecution().executedPlan()]
    seen: set[int] = set()
    max_part = 0
    total = 0
    while roots:
        node = roots.pop(0)
        nid = node.id()
        if nid in seen:
            continue
        seen.add(nid)
        if node.getClass().getSimpleName() == "ShuffleQueryStageExec":
            try:
                ms = node.mapStats()
                if ms.isDefined():
                    b = list(ms.get().bytesByPartitionId())
                    if b:
                        max_part = max(max_part, max(b))
                        total += sum(b)
            except Exception:
                pass
        roots.extend(_plan_children(node))
    return max_part, total


def main() -> None:
    args = sys.argv[1:]
    out_dir = args.pop(0) if args and not args[0].startswith("--") else None
    copies = COPIES
    if args and args[0] == "--copies":
        args.pop(0)
        copies = int(args.pop(0))
    if out_dir is None:
        # copies-specific default so --copies 30 can never silently
        # reuse the 10x replica (/tmp/sf1_replica kept for 10x
        # back-compat with existing replicas)
        out_dir = (
            "/tmp/sf1_replica" if copies == 10 else f"/tmp/scale_replica_{copies}x"
        )
    names = args or DEFAULT_QUERIES
    build_replica(out_dir, copies)
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    for name in names:
        t0 = time.time()
        try:
            df = qs[name](spark, out_dir)
            n = len(df.collect())
            wall = time.time() - t0
            mx, tot = shuffle_stats(df)
            bc = broadcast_exchange_stats(df)
            results.append(
                {
                    "query": name,
                    "wall_s": round(wall, 2),
                    "rows": n,
                    "max_task_shuffle_mb": round(mx / 1e6, 2),
                    "total_shuffle_mb": round(tot / 1e6, 2),
                    # largest broadcast built at this SF — the
                    # executor-memory audit for hinted broadcasts
                    "max_bcast_mb": round(
                        max((s["bytes"] or 0 for s in bc), default=0) / 1e6, 2
                    ),
                    "max_bcast_rows": max(
                        (s["rows"] or 0 for s in bc), default=0
                    ),
                }
            )
            print(results[-1])
        except Exception as exc:  # noqa: BLE001
            results.append({"query": name, "err": f"{type(exc).__name__}: {exc}"[:300]})
            print(results[-1])
    label = "SF1" if copies == 10 else f"SF{copies // 10}"
    path = f"/root/repo/SCALE_{label}.json"
    # Subset runs MERGE into the existing evidence file instead of
    # clobbering it (r12 lesson: a 1-query probe silently replaced the
    # 32-row r11 file). A full default-list run still rewrites. When a
    # subset run's copies count DIFFERS from the prior file's (two
    # copies values can map to one label, e.g. 15 → SF1), merging would
    # mix incomparable scales and overwriting would clobber evidence —
    # refuse both: divert to a copies-suffixed path with a loud
    # warning (r12 ADVICE).
    if args and os.path.exists(path):
        with open(path) as fh:
            prior = json.load(fh)
        if prior.get("copies") == copies:
            merged = {r["query"]: r for r in prior.get("results", [])}
            for r in results:
                merged[r["query"]] = r
            results = list(merged.values())
        else:
            path = f"/root/repo/SCALE_{label}_copies{copies}.json"
            print(
                f"WARNING: existing SCALE_{label}.json was produced with "
                f"copies={prior.get('copies')}, this subset run used "
                f"copies={copies} — refusing to merge or overwrite; "
                f"writing {path} instead"
            )
    with open(path, "w") as fh:
        json.dump({"copies": copies, "results": results}, fh, indent=1)
    print(f"wrote {os.path.basename(path)} ({len(results)} rows)")


if __name__ == "__main__":
    main()
