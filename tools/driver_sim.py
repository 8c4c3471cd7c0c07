"""Replay the driver's correctness gate locally.

The per-round driver runs each ``queries()[name]`` at sf=0.01 and
compares row-count + schema + order-insensitive values against
``oracle_sql()[name]`` via DuckDB. Local tests run the same comparison
at sf0.001 (tests/test_oracle_parity.py); this tool runs it at the
driver's scale so sf-dependent divergence (empty-at-small-sf results,
overflow, skew-triggered plan changes) surfaces before the driver does.

Usage:
    python tools/driver_sim.py [--sf-dir /root/testdata/sf0.01] [--window 50]
    python tools/driver_sim.py --names r5_gapfill_locf,r7_asof_against_scd2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from etl_power_bi_dashboard_spark.plans import REGISTRY  # noqa: E402
from etl_power_bi_dashboard_spark.session import get_spark  # noqa: E402
from tests.parity import canonicalize  # noqa: E402

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--window", type=int, default=50,
                    help="check the first N registry entries (driver window)")
    ap.add_argument("--names", default=None,
                    help="comma-separated subset instead of the window")
    args = ap.parse_args()

    if args.names:
        names = [n.strip() for n in args.names.split(",") if n.strip()]
    else:
        names = list(REGISTRY)[: args.window]

    con = duckdb.connect()
    for t in TABLES:
        path = f"{args.sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    spark = get_spark(shuffle_partitions=32)
    results: dict[str, dict] = {}
    n_fail = 0
    for name in names:
        t0 = time.time()
        row: dict = {}
        try:
            # inside the try: a typo'd --names entry records an ERROR
            # row and the run continues — mirrors the driver
            q = REGISTRY[name]
            pdf_s = q.spark(spark, args.sf_dir).toPandas()
            if q.oracle is None:
                row = {"status": "rows_only", "spark_rows": len(pdf_s)}
            else:
                pdf_o = con.execute(q.oracle).fetchdf()
                cols_ok = sorted(pdf_s.columns) == sorted(pdf_o.columns)
                rows_ok = len(pdf_s) == len(pdf_o)
                vals_ok = cols_ok and canonicalize(pdf_s) == canonicalize(pdf_o)
                ok = cols_ok and rows_ok and vals_ok
                row = {
                    "status": "ok" if ok else "MISMATCH",
                    "schema_match": cols_ok,
                    "rows_match": rows_ok,
                    "hash_match": vals_ok,
                    "spark_rows": len(pdf_s),
                    "oracle_rows": len(pdf_o),
                }
                if not ok:
                    n_fail += 1
        except Exception as exc:  # record, keep going — mirrors the driver
            row = {"status": "ERROR", "err": f"{type(exc).__name__}: {exc}"[:300]}
            n_fail += 1
        row["sec"] = round(time.time() - t0, 2)
        results[name] = row
        print(f"{row['status']:>8}  {name}  ({row['sec']}s)", flush=True)

    spark.stop()
    con.close()
    print(json.dumps({"checked": len(names), "failed": n_fail}))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
