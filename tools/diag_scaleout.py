"""Scale-OUT probe for a single registered query (r8 brief item 7):
run it at a given sf_dir under a given shuffle-partition count in a
FRESH JVM and report best-of-N wall-clock.

A fixed 32-thread host cannot add executors, so "scales out" is
demonstrated as partition-count insensitivity: if wall-clock stays
flat as the shuffle fans out over 4x the partitions (each task doing
1/4 the work), no stage is serial and no per-task state is
load-bearing — the plan spreads. A query that NEEDS big per-task
state (a spilling hash aggregate) speeds up with more partitions; a
query with a serial bottleneck slows down proportionally to waves.

Usage: python tools/diag_scaleout.py <query> <shuffle_partitions> <sf_dir> [n_runs]
Prints one JSON line; compose artifacts with json.dump, never
redirected stdout.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name, parts, sf_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    n_runs = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    from data_pipeline_example_spark.session import get_spark
    from data_pipeline_example_spark.plans.queries import QUERIES
    from tools.bench_scaling import _drop_persisted

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name=f"scaleout_{name}_{parts}",
        master=f"local[{cpus}]",
        shuffle_partitions=parts,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "8g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    fn = QUERIES[name]
    runs = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
        _drop_persisted(spark)
    print(json.dumps({"query": name, "shuffle_partitions": parts,
                      "sf_dir": sf_dir, "runs": runs, "best": min(runs)}))
    spark.stop()


if __name__ == "__main__":
    main()
