"""Round-12 optimization probe: time individual registry/bench queries
with the bench's own methodology (fresh session, untimed warmup, noop
sink, best-of-N) and optionally dump `.explain("formatted")` — so an
optimization A/B runs on exactly the measurement the driver grades.

Usage:
    python tools/probe_query.py QUERY [QUERY...] [--reps 3] [--sf-dir D]
        [--explain-dir plans/r12] [--suffix before]

Bench-only variants (d2_ngram_jaccard_full, d3_minhash_lsh_full/fast)
resolve through bench._tail_plan; d3 variants build their shared shingle
table untimed, exactly like bench.py.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from etl_power_bi_dashboard_spark.session import get_spark  # noqa: E402


def explain_text(df) -> str:
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--shared-session", action="store_true",
                    help="one session for all queries (bench TAIL style)")
    args = ap.parse_args()

    import bench  # noqa: E402
    from etl_power_bi_dashboard_spark.plans import REGISTRY  # noqa: E402

    spark = None
    results: dict[str, list[float]] = {}
    for name in args.queries:
        if spark is None or not args.shared_session:
            if spark is not None:
                spark.stop()
            spark = get_spark(app_name=f"probe-{name}")
            spark.sparkContext.setLogLevel("ERROR")
            # bench warmups (untimed): python workers + codegen
            REGISTRY["dax_measures"].spark(spark, args.sf_dir).write.format(
                "noop").mode("overwrite").save()
            REGISTRY["m1_multimodal_features"].spark(spark, args.sf_dir) \
                .write.format("noop").mode("overwrite").save()
        kwargs = {}
        if name in bench._D3_HASHER:
            from etl_power_bi_dashboard_spark.plans.dedup_plans import (
                d3_shingle_table,
            )
            kwargs["shingles"] = d3_shingle_table(
                spark, args.sf_dir, max_doc=None).localCheckpoint()
        plan = bench._tail_plan(name)
        spark.sparkContext.setJobDescription(f"probe:{name}")
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            with open(os.path.join(
                    args.explain_dir, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(explain_text(plan(spark, args.sf_dir, **kwargs)))
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            plan(spark, args.sf_dir, **kwargs).write.format("noop").mode(
                "overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        results[name] = times
        print(f"{name}: best={min(times):.3f} reps={times}", flush=True)
    print("SUMMARY " + " ".join(
        f"{n}={min(t):.3f}" for n, t in results.items()))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
