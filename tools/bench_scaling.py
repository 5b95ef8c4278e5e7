"""Two-decade scaling measurement: run the bench headline set at
sf0.1 AND the upsampled sf1 (tools/gen_sf.py) and report per-query
wall-clock ratios against the 10× data growth.

    python tools/bench_scaling.py [sf_small] [sf_big]

Prints one JSON line:
    {"metric": "scaling_sf0.1_to_sf1", "queries": {name:
        {"small": s, "big": s, "ratio": big/small}}, ...}

A ratio near 10 is linear for a 32-thread fixed-resource host once the
query is compute-bound; well under 10 means fixed per-query overhead
(plan latency, Arrow worker spin-up) still dominates at sf0.1. Ratios
meaningfully above ~15 flag super-linear work or a spilling shuffle —
those get a plan audit (VERDICT r3 asked for exactly this evidence).

Timing protocol matches bench.py: noop sink (full plan executes,
nothing collected), min of 2 runs, adaptive 3rd on >40% disagreement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_query(fn, spark, sf_dir) -> float:
    runs = []
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    if min(runs) > 0.5 and abs(runs[0] - runs[1]) / min(runs) > 0.4:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 3)


def main() -> None:
    from bench import HEADLINE
    from data_pipeline_example_spark.plans.queries import QUERIES
    from data_pipeline_example_spark.session import get_spark

    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.localdata/sf1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="bench_scaling",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "8g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(int(cpus)).repartition(int(cpus)).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        s = time_query(fn, spark, small)
        b = time_query(fn, spark, big)
        out[name] = {"small": s, "big": b, "ratio": round(b / s, 2) if s else None}
        print(f"  {name:32s} {s:7.3f}s -> {b:7.3f}s  x{out[name]['ratio']}", file=sys.stderr)

    totals = {
        "small_total": round(sum(v["small"] for v in out.values()), 3),
        "big_total": round(sum(v["big"] for v in out.values()), 3),
    }
    totals["total_ratio"] = round(totals["big_total"] / totals["small_total"], 2)
    print(
        json.dumps(
            {
                "metric": "scaling_sf0.1_to_sf1",
                "data_factor": 10,
                "queries": out,
                **totals,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
