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


def test_binary_file_source_feeds_multimodal_ops(spark, tmp_path):
    import hashlib

    from data_pipeline_example_spark.operators import multimodal
    from data_pipeline_example_spark.sources import read_binary_dir
    from pyspark.sql import functions as F2

    blobs = {"a.bin": b"\x00\x01\x02payload", "b.bin": b"xyz", "skip.txt": b"no"}
    for name, content in blobs.items():
        (tmp_path / name).write_bytes(content)

    df = read_binary_dir(spark, str(tmp_path), glob="*.bin")
    got = {r["path"].rsplit("/", 1)[-1]: bytes(r["content"]) for r in df.collect()}
    assert got == {"a.bin": blobs["a.bin"], "b.bin": blobs["b.bin"]}

    # pipe straight into the Arrow-batched feature extractor
    media = df.select(
        F2.monotonically_increasing_id().alias("doc_id"),
        F2.col("content"),
        F2.col("length").alias("n_chars"),
    )
    feats = {bytes(r["content_md5"], "ascii") if isinstance(r["content_md5"], str)
             else r["content_md5"]: r["n_bytes"]
             for r in multimodal.extract_features(media).collect()}
    expected = {hashlib.md5(c).hexdigest().encode("ascii"): len(c)
                for c in (blobs["a.bin"], blobs["b.bin"])}
    assert {k if isinstance(k, bytes) else k.encode(): v for k, v in feats.items()} == expected


def test_read_text_dir_lines_wholefile_and_nul_sep(spark, tmp_path):
    from data_pipeline_example_spark.sources import read_text_dir

    d = tmp_path / "txt"
    d.mkdir()
    (d / "a.txt").write_text("doc one\ndoc two\n")
    (d / "b.txt").write_text("doc three\n")
    lines = sorted(r["value"] for r in read_text_dir(spark, str(d)).collect())
    assert lines == ["doc one", "doc three", "doc two"]

    whole = sorted(
        r["value"] for r in read_text_dir(spark, str(d), whole_file=True).collect()
    )
    assert whole == ["doc one\ndoc two\n", "doc three\n"]

    n = tmp_path / "nul"
    n.mkdir()
    (n / "c.txt").write_text("alpha\0beta\0")
    nul = sorted(
        r["value"]
        for r in read_text_dir(spark, str(n), line_sep="\0").collect()
        if r["value"]
    )
    assert nul == ["alpha", "beta"]
