"""Parallelism hygiene for CPU-heavy per-row operators.

Benchmark-scale corpora arrive as a single small parquet file, so the
scan yields ONE input partition and every downstream narrow operation
(regexp shingling, md5 hashing, token explosion) runs on one core of
the whole cluster. At production scale the same scan yields thousands
of split partitions and no intervention is needed — so the widening
below is conditional on the *actual plan partitioning*, not data size:
it is a no-op exactly when the cluster is already busy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen(df: DataFrame) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's shuffle
    parallelism iff its current physical partitioning is narrower.

    Use immediately upstream of expensive per-row column work (hashing,
    shingling, vector math) whose cost dwarfs one shuffle of the raw
    rows. Partition-count inspection plans the query but runs no job;
    results of every caller are partitioning-agnostic, so this never
    changes output.
    """
    spark = df.sparkSession
    # defaultParallelism = slots that can actually run at once (cores in
    # local mode, executor cores on a cluster) — the shuffle-partition
    # conf can be far larger, and repartitioning a tiny frame into
    # hundreds of slivers costs more in task overhead than it buys.
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
