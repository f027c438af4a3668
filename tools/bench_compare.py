"""Compare two bench JSON lines (e.g. BENCH_r02.json vs a fresh run):
per-query delta, regressions sorted worst-first, common-subset totals.

Usage: python tools/bench_compare.py OLD.json NEW.json [threshold=1.5]
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        doc = json.load(f)
    if "parsed" in doc:  # driver BENCH_r{N}.json wrapper
        doc = doc["parsed"] or {}
    q = doc.get("queries", {})
    return {k: v for k, v in q.items() if isinstance(v, (int, float))}


def main() -> None:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    common = sorted(set(old) & set(new))
    rows = [(n, old[n], new[n], new[n] / old[n] if old[n] else float("inf")) for n in common]
    rows.sort(key=lambda r: r[3], reverse=True)
    total_old = sum(old[n] for n in common)
    total_new = sum(new[n] for n in common)
    print(f"common subset: {len(common)} queries; "
          f"{total_old:.1f}s -> {total_new:.1f}s ({total_new / total_old:.2f}x)")
    regressions = [r for r in rows if r[3] >= threshold and r[2] - r[1] > 0.2]
    if regressions:
        print(f"regressions (>= {threshold}x and >0.2s):")
        for n, a, b, ratio in regressions:
            print(f"  {n}: {a:.2f}s -> {b:.2f}s ({ratio:.2f}x)")
    else:
        print(f"no regressions >= {threshold}x")
    added = sorted(set(new) - set(old))
    if added:
        print(f"new queries ({len(added)}): " + ", ".join(added))


if __name__ == "__main__":
    main()
