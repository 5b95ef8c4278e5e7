"""Diagnose basket_affinity's second decade (r8 verdict "What's wrong
#2"): is the measured x12.5 at sf1->sf10 the fixed-shuffle-partition
spill the r8 diagnosis claimed, or a super-linear plan?

Runs basket_affinity at sf1 and sf10 under two configs in SEPARATE
JVMs (config is session-wide):
  A. fixed 32 shuffle partitions (the bench_scaling config that
     measured x12.5)
  B. data-proportional partitions at sf10 (320; AQE coalesces down
     where stages are small) — what a real cluster would run

Writes artifacts/diag_basket_affinity_r10.json via json.dump (never
redirected stdout — the r8 corrupted-artifact lesson).

Usage: python tools/diag_basket_affinity.py <shuffle_partitions> <sf_dir> <tag>
  (single measurement; the orchestrating shell composes the artifact)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parts, sf_dir, tag = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    from data_pipeline_example_spark.session import get_spark
    from data_pipeline_example_spark.plans.queries import QUERIES
    from tools.bench_scaling import _drop_persisted

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name=f"diag_basket_{tag}",
        master=f"local[{cpus}]",
        shuffle_partitions=parts,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "8g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    fn = QUERIES["basket_affinity"]
    n_runs = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    runs = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
        _drop_persisted(spark)
    rec = {"tag": tag, "shuffle_partitions": parts, "sf_dir": sf_dir,
           "runs": runs, "best": min(runs)}
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
