"""Degeneracy sweep — hunt ml6-class evidence holes.

The round-8 audit found a query (ml6) whose filter matched ZERO fixture
rows: both engines returned 0 rows, the driver hash gate recorded a
green, and the statistic had never actually executed. This sweep runs
every registry query at a given SF and flags outputs whose agreement is
vacuous:

- 0 rows;
- every row entirely NULL outside the first (key) column;
- any individual column that is NULL in every row (a guard or lag that
  never fires — weaker signal, but worth an eyeball);
- fully-identical duplicate output rows (a report row appearing twice
  usually means a join fanned out or a key collided — the u1
  duplicate-key catch was one column short of this flag).

A flag is not automatically a bug (an empty anomaly report can be the
right answer), but every flag is a place where the correctness gate
proves less than it appears to.

Usage: python tools/degeneracy_sweep.py [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from etl_power_bi_dashboard_spark.plans import REGISTRY
    from etl_power_bi_dashboard_spark.session import get_spark

    spark = get_spark(app_name="degeneracy-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    flags: list[str] = []
    for name, q in REGISTRY.items():
        try:
            rows = q.spark(spark, args.sf_dir).collect()
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            flags.append(f"{name}: ERROR {str(ex)[:120]}")
            continue
        if not rows:
            flags.append(f"{name}: 0 rows")
            continue
        cols = rows[0].__fields__
        if len(cols) > 1 and all(
            all(r[c] is None for c in cols[1:]) for r in rows
        ):
            flags.append(f"{name}: all non-key columns NULL in every row")
            continue
        dead = [
            c for c in cols if all(r[c] is None for r in rows)
        ]
        if dead:
            flags.append(f"{name}: always-NULL column(s) {dead}")
        seen: set = set()
        dups = 0
        for r in rows:
            key = tuple(
                tuple(v) if isinstance(v, list) else v for v in r
            )
            if key in seen:
                dups += 1
            else:
                seen.add(key)
        if dups:
            flags.append(f"{name}: {dups} fully-identical duplicate row(s)")
    print(f"swept {len(REGISTRY)} queries at {args.sf_dir}")
    if flags:
        print(f"{len(flags)} degeneracy flag(s):")
        for f in flags:
            print("  " + f)
    else:
        print("no degeneracy flags")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
