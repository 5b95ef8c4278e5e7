"""Z-order key correctness (vs a Python bit-interleave reference) and
the clustered-write layout property it exists for."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from data_pipeline_example_spark.functions.zorder import morton_key, spread_bits


def _ref_interleave(a: int, b: int) -> int:
    out = 0
    for i in range(32):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_morton_key_matches_reference(spark):
    rng = random.Random(7)
    rows = [(i, rng.randrange(0, 2**32), rng.randrange(0, 2**32)) for i in range(200)]
    rows += [(200, 0, 0), (201, 2**32 - 1, 2**32 - 1), (202, 0, 2**32 - 1)]
    df = spark.createDataFrame(rows, ["i", "a", "b"])
    got = {
        r["i"]: r["k"]
        for r in df.select("i", morton_key(F.col("a"), F.col("b")).alias("k")).collect()
    }
    for i, a, b in rows:
        expect = _ref_interleave(a, b)
        # Spark longs are signed; the reference interleave of two full
        # 32-bit values can set bit 63 — compare as unsigned 64-bit
        assert got[i] % (1 << 64) == expect, (i, a, b)


def test_zorder_sort_key_unsigned_order_full_range(spark):
    """Bit 31 of the second column sets bit 63 of the raw interleave
    (negative as a signed long); the sort key must still order those
    rows AFTER smaller keys — i.e. signed order on zorder_sort_key ==
    unsigned order on the raw interleave (the ADVICE regression)."""
    from data_pipeline_example_spark.functions.zorder import zorder_sort_key

    rng = random.Random(11)
    rows = [(i, rng.randrange(0, 2**32), rng.randrange(0, 2**32)) for i in range(300)]
    rows += [(300, 0, 2**31), (301, 2**32 - 1, 2**32 - 1), (302, 5, 3)]
    df = spark.createDataFrame(rows, ["i", "a", "b"])
    got = df.select(
        "i", zorder_sort_key(F.col("a"), F.col("b")).alias("sk")
    ).collect()
    by_sort_key = [r["i"] for r in sorted(got, key=lambda r: r["sk"])]
    by_unsigned = [
        i for i, _, _ in sorted(rows, key=lambda t: _ref_interleave(t[1], t[2]))
    ]
    assert by_sort_key == by_unsigned


def test_spread_bits_even_positions_only(spark):
    df = spark.range(1).select(spread_bits(F.lit(0xFFFFFFFF)).alias("s"))
    s = df.collect()[0]["s"] % (1 << 64)
    assert s == 0x5555555555555555  # every even bit set, odd bits clear


def test_zordered_write_clusters_both_dims(spark, tmp_path):
    from data_pipeline_example_spark.sinks import write_zordered_parquet

    # 64x64 grid, shuffled — a row-major sort would cluster x only
    pts = [(x, y) for x in range(64) for y in range(64)]
    random.Random(3).shuffle(pts)
    df = spark.createDataFrame(pts, ["x", "y"]).repartition(8)
    out = str(tmp_path / "z")
    write_zordered_parquet(df, out, "x", "y", partitions=16)
    back = spark.read.parquet(out)
    assert back.count() == 64 * 64
    # per-file spans: Z-order keeps BOTH dimensions bounded per file;
    # 4096 rows over 16 range-partitioned files → each file covers a
    # 256-cell Z-curve segment, spanning ≤ 1/2 the domain in each dim
    import pyarrow.parquet as pq
    import glob as g

    spans = []
    for f in g.glob(out + "/*.parquet"):
        t = pq.read_table(f)
        xs, ys = t.column("x").to_pylist(), t.column("y").to_pylist()
        spans.append((max(xs) - min(xs), max(ys) - min(ys)))
    assert all(sx <= 32 and sy <= 32 for sx, sy in spans), spans
