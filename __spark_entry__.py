"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``data_pipeline_example_spark``; this module is
just the wiring.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_example_spark.plans.oracles import ORACLES
from data_pipeline_example_spark.plans.queries import QUERIES, flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (daily revenue per product, SURVEY.md §7.1) on
    /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + extensions."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for each SQL-expressible query — every registry
    entry is hash-oracled (user_reach_rollup moved from opaque HLL
    binaries to an exactly-mergeable KMV rollup in r6, closing the
    last rows-only entry; kmeans_embeddings got its unrolled-CTE twin
    in r5)."""
    return dict(ORACLES)
