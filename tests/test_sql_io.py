"""SQL entry surface + JSON/ORC source-sink round-trips."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_example_spark import sinks, sql
from data_pipeline_example_spark.sources import read_json_dir, read_orc_dir


def test_run_sql_matches_dataframe_api(spark, sf_dir):
    got = sql.run_sql(
        spark,
        sf_dir,
        """
        SELECT n.n_name, round(sum(o.o_totalprice), 2) AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """,
    )
    from data_pipeline_example_spark.sources import load_table

    expect = (
        load_table(spark, sf_dir, "orders")
        .join(load_table(spark, sf_dir, "customer"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(load_table(spark, sf_dir, "nation"),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))


def test_sql_views_cover_all_tables(spark, sf_dir):
    from data_pipeline_example_spark.sources import TABLE_NAMES

    sql.register_views(spark, sf_dir)
    for t in TABLE_NAMES:
        assert spark.table(t).count() > 0


def test_json_roundtrip_with_schema(spark, tmp_path):
    out = str(tmp_path / "j")
    df = spark.createDataFrame([(1, "a", 2.5), (2, None, 0.5)], ["id", "s", "v"])
    sinks.write_json(df, out)
    back = read_json_dir(spark, out, schema="id LONG, s STRING, v DOUBLE")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    # tolerant contract: unknown keys dropped, missing keys null
    partial = read_json_dir(spark, out, schema="id LONG, missing STRING")
    assert {tuple(r) for r in partial.collect()} == {(1, None), (2, None)}


def test_orc_roundtrip(spark, tmp_path):
    out = str(tmp_path / "o")
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "s"])
    sinks.write_orc(df, out)
    assert sorted(map(tuple, read_orc_dir(spark, out).collect())) == [(1, "a"), (2, "b")]
