"""End-to-end golden pipeline test (SURVEY.md §5 item 3): seeded retail
CSV fixture → full batch flow → verify curated Parquet + KPI outputs."""

from __future__ import annotations

import csv
import random

import pytest

from pyspark.sql import functions as F

from data_pipeline_example_spark.pipeline import run_batch_pipeline

PRODUCTS = ["Masala Dosa", "Idli", "Vada", "Filter Coffee", "Upma"]


def _make_fixture(path, days=3, rows_per_day=12, seed=2024):
    """Seeded generator in the spirit of the reference's
    generate_synthetic_data.py (one CSV per day, decimal strings)."""
    rng = random.Random(seed)
    expected = {}
    for d in range(1, days + 1):
        date = f"2025-01-{d:02d}"
        fp = path / f"sales_{date}.csv"
        with open(fp, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["order_id", "order_date", "product", "quantity", "unit_price", "amount"])
            for i in range(rows_per_day):
                product = rng.choice(PRODUCTS)
                qty = rng.randint(1, 5)
                price = round(rng.uniform(10, 200), 2)
                amount = round(qty * price, 2)
                w.writerow([f"{date}-{i:04d}", date, product, qty, f"{price:.2f}", f"{amount:.2f}"])
                key = (date, product)
                expected[key] = round(expected.get(key, 0.0) + amount, 2)
    return expected


def test_batch_pipeline_golden(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    expected = _make_fixture(in_dir)

    out_parquet = str(tmp_path / "daily")
    out_csv = str(tmp_path / "dash")
    result = run_batch_pipeline(spark, str(in_dir), out_parquet, out_csv)
    assert result is not None

    # curated parquet round-trips with date partitioning
    curated = spark.read.parquet(out_parquet)
    got = {
        (str(r["order_date"]), r["product"]): round(r["total_amount"], 2)
        for r in curated.collect()
    }
    assert got == expected

    # KPI grand total == sum of all amounts
    kpi = result.kpis.collect()[0]
    assert kpi["grand_total"] == round(sum(expected.values()), 2)
    assert kpi["rows"] == 36
    assert kpi["distinct_products"] <= len(PRODUCTS)

    # dashboard CSV exists with a header, single part file
    import glob

    parts = glob.glob(f"{out_csv}/part-*.csv")
    assert len(parts) == 1
    with open(parts[0]) as f:
        header = f.readline().strip().split(",")
    assert header == ["order_date", "product", "total_amount"]
    kpi_parts = glob.glob(f"{out_csv}_kpis/part-*.csv")
    assert len(kpi_parts) == 1


def test_batch_pipeline_empty_input_returns_none(spark, tmp_path):
    in_dir = tmp_path / "empty"
    in_dir.mkdir()
    (in_dir / "nothing.csv").write_text("")
    assert run_batch_pipeline(spark, str(in_dir), str(tmp_path / "out")) is None


def test_dynamic_partition_overwrite_only_touches_written_dates(spark, tmp_path):
    in_dir = tmp_path / "in1"
    in_dir.mkdir()
    _make_fixture(in_dir, days=2)
    out = str(tmp_path / "daily")
    run_batch_pipeline(spark, str(in_dir), out)
    first = {str(r["order_date"]) for r in spark.read.parquet(out).collect()}
    assert first == {"2025-01-01", "2025-01-02"}

    # rerun with only day 3 → days 1-2 partitions must survive
    in_dir2 = tmp_path / "in2"
    in_dir2.mkdir()
    rows = [
        ["order_id", "order_date", "product", "quantity", "unit_price", "amount"],
        ["x-1", "2025-01-03", "Idli", "1", "10.00", "10.00"],
    ]
    with open(in_dir2 / "d3.csv", "w", newline="") as f:
        csv.writer(f).writerows(rows)
    run_batch_pipeline(spark, str(in_dir2), out)
    after = {str(r["order_date"]) for r in spark.read.parquet(out).collect()}
    assert after == {"2025-01-01", "2025-01-02", "2025-01-03"}


def test_observation_metrics_report_drops(spark, tmp_path):
    in_dir = tmp_path / "obs"
    in_dir.mkdir()
    rows = [
        ["order_id", "order_date", "product", "quantity", "unit_price", "amount"],
        ["a", "2025-01-01", "Idli", "1", "10.00", "10.00"],
        ["b", "garbage-date", "Vada", "1", "5.00", "5.00"],   # invalid date → dropped
        ["c", "2025-01-02", "Dosa", "1", "2.00", "junk"],     # bad amount → null
    ]
    with open(in_dir / "x.csv", "w", newline="") as f:
        csv.writer(f).writerows(rows)
    result = run_batch_pipeline(spark, str(in_dir), str(tmp_path / "out"))
    assert result.observed_metrics["invalid_dates"] == 1
    assert result.observed_metrics["null_amounts"] == 1


def test_compact_partitions_reduces_files(spark, tmp_path):
    import glob

    from data_pipeline_example_spark import sinks

    out = str(tmp_path / "compact")
    df = spark.createDataFrame(
        [(d, i, float(i)) for d in ("2024-01-01", "2024-01-02") for i in range(100)],
        ["day", "k", "v"],
    )
    # 20 writer tasks → many small files per partition
    df.repartition(20).write.partitionBy("day").parquet(out)
    before = len(glob.glob(f"{out}/day=*/*.parquet"))
    assert before > 2

    written = sinks.compact_partitions(spark, out, "day", target_rows_per_file=100)
    after = len(glob.glob(f"{out}/day=*/*.parquet"))
    assert after < before
    assert written == {"2024-01-01": 1, "2024-01-02": 1}
    back = spark.read.parquet(out)
    assert back.count() == 200
    assert back.agg(F.sum("v")).collect()[0][0] == 2 * sum(range(100))


def test_upsert_partitioned_merge_semantics(spark, tmp_path):
    from data_pipeline_example_spark import sinks

    out = str(tmp_path / "upsert")
    base = spark.createDataFrame(
        [("2024-01-01", 1, "old"), ("2024-01-01", 2, "old"), ("2024-01-02", 3, "old")],
        ["day", "k", "v"],
    )
    base.write.partitionBy("day").parquet(out)

    updates = spark.createDataFrame(
        [("2024-01-01", 2, "new"), ("2024-01-01", 9, "new")], ["day", "k", "v"]
    )
    sinks.upsert_partitioned(spark, out, updates, key_cols=["day", "k"], partition_col="day")

    # partition values come back type-inferred (date), so compare on str
    got = {(str(r["day"]), r["k"]): r["v"] for r in spark.read.parquet(out).collect()}
    assert got == {
        ("2024-01-01", 1): "old",   # untouched key in touched partition
        ("2024-01-01", 2): "new",   # replaced
        ("2024-01-01", 9): "new",   # inserted
        ("2024-01-02", 3): "old",   # untouched partition never rewritten
    }


def test_sorted_parquet_has_tight_rowgroup_stats(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from data_pipeline_example_spark import sinks

    out = str(tmp_path / "sorted")
    df = spark.range(0, 10000).select(
        (F.col("id") * 7919 % 10000).alias("k"), F.col("id").alias("v")
    )
    sinks.write_sorted_parquet(df, out, ["k"], partitions=4)

    files = sorted(glob.glob(f"{out}/*.parquet"))
    assert len(files) == 4
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        col = md.row_group(0).column(0)
        lo = col.statistics.min
        hi = md.row_group(md.num_row_groups - 1).column(0).statistics.max
        ranges.append((lo, hi))
    ranges.sort()
    # global range partitioning → per-file key ranges are disjoint
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev < lo_next
    # and the data round-trips completely
    assert spark.read.parquet(out).count() == 10000


def test_upsert_keys_may_move_no_stale_rows(spark, tmp_path):
    import glob

    from data_pipeline_example_spark import sinks

    out = str(tmp_path / "upsert_move")
    base = spark.createDataFrame(
        [("2024-01-01", 42, "old"), ("2024-01-01", 7, "keep"), ("2024-01-03", 5, "keep")],
        ["day", "k", "v"],
    )
    base.write.partitionBy("day").parquet(out)

    # key 42 moves 01-01 -> 01-02; key 5 moves 01-03 -> 01-02, emptying
    # its old partition entirely (the dynamic-overwrite blind spot)
    updates = spark.createDataFrame(
        [("2024-01-02", 42, "new"), ("2024-01-02", 5, "new")], ["day", "k", "v"]
    )
    sinks.upsert_partitioned(
        spark, out, updates, key_cols=["k"], partition_col="day", keys_may_move=True
    )

    got = {(str(r["day"]), r["k"]): r["v"] for r in spark.read.parquet(out).collect()}
    assert got == {
        ("2024-01-01", 7): "keep",
        ("2024-01-02", 42): "new",
        ("2024-01-02", 5): "new",
    }
    # the emptied partition directory is actually gone
    assert glob.glob(f"{out}/day=2024-01-03") == []


def test_compact_partitions_handles_null_partition(spark, tmp_path):
    import glob

    from data_pipeline_example_spark import sinks

    out = str(tmp_path / "compact_null")
    df = spark.createDataFrame(
        [(None if i % 2 == 0 else "2024-01-01", i, float(i)) for i in range(100)],
        "day string, k long, v double",
    )
    df.repartition(10).write.partitionBy("day").parquet(out)
    before_null = len(glob.glob(f"{out}/day=__HIVE_DEFAULT_PARTITION__/*.parquet"))
    assert before_null > 1

    written = sinks.compact_partitions(spark, out, "day", target_rows_per_file=100)
    assert written == {"2024-01-01": 1, "__HIVE_DEFAULT_PARTITION__": 1}
    after_null = len(glob.glob(f"{out}/day=__HIVE_DEFAULT_PARTITION__/*.parquet"))
    assert after_null < before_null
    back = spark.read.parquet(out)
    assert back.count() == 100
    assert back.filter(F.col("day").isNull()).count() == 50
