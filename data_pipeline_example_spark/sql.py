"""Raw-SQL entry surface — every engine table registered as a temp view
so users can run ANSI SQL directly (the same statements the DuckDB
oracles use run unchanged here, modulo dialect).

The reference exposes no SQL interface; its dashboards re-implement
queries in pandas (`dashboard/app.py:33-43`). Registering the conformed
tables once and letting Catalyst plan raw SQL replaces that layer: a
temp view is just a named logical plan, so SQL over these views gets
identical pushdown/pruning/codegen to the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_example_spark.sources import TABLE_NAMES, load_table


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view named after itself."""
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run a raw SQL query against the registered tables."""
    register_views(spark, sf_dir)
    return spark.sql(query)
