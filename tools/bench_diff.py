"""Fail-loud bench regression gate (pre-commit ritual, next to selfcheck).

Diffs the working-tree ``BENCH_DETAIL.json`` against the last COMMITTED
one (``git show HEAD:BENCH_DETAIL.json``) and exits 1 if any common
query regressed by BOTH >= 2x AND >= +0.5 s — the composition-drift
guard prescribed by VERDICT r5 task 7. Explicit paths may be given to
compare arbitrary details (e.g. two driver rounds).

Usage:
    python tools/bench_diff.py                 # HEAD detail vs working tree
    python tools/bench_diff.py OLD.json NEW.json [ratio=2.0] [abs_s=0.5]
"""

from __future__ import annotations

import json
import subprocess
import sys

RATIO = 2.0
ABS_S = 0.5


def _queries(doc: dict) -> dict[str, float]:
    if "parsed" in doc:  # driver BENCH_r{N}.json wrapper
        doc = doc["parsed"] or {}
    return {
        k: float(v)
        for k, v in doc.get("queries", {}).items()
        if isinstance(v, (int, float))
    }


def load_path(path: str) -> dict[str, float]:
    with open(path) as f:
        return _queries(json.load(f))


def load_head(path: str = "BENCH_DETAIL.json") -> dict[str, float]:
    out = subprocess.run(
        ["git", "show", f"HEAD:{path}"], capture_output=True, text=True
    )
    if out.returncode != 0:
        print(f"bench_diff: no committed {path} at HEAD — nothing to gate")
        return {}
    return _queries(json.loads(out.stdout))


def main() -> int:
    args = sys.argv[1:]
    if len(args) >= 2:
        old, new = load_path(args[0]), load_path(args[1])
        ratio = float(args[2]) if len(args) > 2 else RATIO
        abs_s = float(args[3]) if len(args) > 3 else ABS_S
    else:
        old, new = load_head(), load_path("BENCH_DETAIL.json")
        ratio, abs_s = RATIO, ABS_S
    if not old:
        return 0
    common = sorted(set(old) & set(new))
    total_old = sum(old[n] for n in common)
    total_new = sum(new[n] for n in common)
    print(
        f"common subset: {len(common)} queries; "
        f"{total_old:.1f}s -> {total_new:.1f}s"
        + (f" ({total_new / total_old:.2f}x)" if total_old else "")
    )
    bad = [
        (n, old[n], new[n])
        for n in common
        if old[n] > 0 and new[n] / old[n] >= ratio and new[n] - old[n] >= abs_s
    ]
    for n, a, b in sorted(bad, key=lambda r: r[2] / r[1], reverse=True):
        print(f"REGRESSION {n}: {a:.2f}s -> {b:.2f}s ({b / a:.2f}x, +{b - a:.2f}s)")
    dropped = sorted(set(old) - set(new))
    if dropped:
        print(f"dropped queries ({len(dropped)}): " + ", ".join(dropped))
    added = sorted(set(new) - set(old))
    if added:
        print(f"new queries ({len(added)}): " + ", ".join(added))
    if bad:
        print(f"FAIL: {len(bad)} query(ies) regressed >= {ratio}x and >= +{abs_s}s")
        return 1
    print("OK: no gated regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main())
