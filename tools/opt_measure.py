"""Per-query optimization probe (r15).

For each named query: time DataFrame *construction* (planning +
any driver-side collects inside the operator) and *execution*
(noop sink) separately, min over N runs, and optionally dump
``explain('formatted')`` to a file.

Usage:
    python tools/opt_measure.py [--runs N] [--sf DIR] [--plans DIR] [--suffix S] q1 q2 ...
    python tools/opt_measure.py --all            # every headline query

Prints one JSON line per query:
    {"q": name, "construct": s, "exec": s, "total": s, "runs": N}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--plans", default=None, help="dir to write explain output")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from bench import HEADLINE
    from data_pipeline_example_spark.plans.queries import QUERIES
    from data_pipeline_example_spark.session import get_spark

    names = HEADLINE if args.all else args.queries
    spark = get_spark(
        app_name="opt_measure",
        master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus),
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "8g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    spark.read.parquet(f"{args.sf}/region.parquet").write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(int(args.cpus)).repartition(int(args.cpus)).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    out = {}
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"opt_measure: {name}")
        cons, exe = [], []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            cons.append(t1 - t0)
            exe.append(t2 - t1)
        rec = {
            "q": name,
            "construct": round(min(cons), 3),
            "exec": round(min(exe), 3),
            "total": round(min(cons) + min(exe), 3),
            "runs": args.runs,
        }
        out[name] = rec
        print(json.dumps(rec), flush=True)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)
        spark.sparkContext.setJobDescription(None)
    total = round(sum(r["total"] for r in out.values()), 3)
    print(json.dumps({"n": len(out), "sum_total": total}))
    spark.stop()


if __name__ == "__main__":
    main()
