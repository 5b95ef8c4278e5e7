"""Skew-resilient aggregation — the salting pattern for 100 TB keys.

AQE's skew-join splitting handles skewed JOINS automatically
(session.py turns it on), but a skewed GROUP BY key still funnels one
reducer. ``salted_agg`` implements the standard two-stage shape:

    stage 1: groupBy(keys + salt)  — the hot key spreads over
             ``salt_buckets`` reducers, partial results are tiny
    stage 2: groupBy(keys)         — re-combines ``salt_buckets`` rows
             per key, trivially cheap

Only algebraic aggregates (sum/count/min/max) can be re-combined this
way; avg must be decomposed to sum+count by the caller.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps column → one of sum/count/min/max. Output columns are
    named ``<fn>_<col>``. Result is identical to the direct
    ``groupBy(keys).agg(...)`` — only the shuffle shape differs.
    """
    _COMBINE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    _PARTIAL = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for fn in aggs.values():
        if fn not in _PARTIAL:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")

    salt = F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt_buckets))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[_PARTIAL[fn](c).alias(f"{fn}_{c}") for c, fn in aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[_COMBINE[fn](f"{fn}_{c}").alias(f"{fn}_{c}") for c, fn in aggs.items()]
    )
