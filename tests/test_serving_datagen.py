"""Serving-payload parity + synthetic generator tests.

The serving tests check payload shape/keys against the reference's JSON
contract (`dashboard/app.py:45-50`, `streaming_dashboard/app.py:155-172`)
and cross-check values against an independent computation on the same
rows. The datagen test runs the generated corpus through the full batch
pipeline (generator → conform → aggregate), closing the reference's
end-to-end loop.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_pipeline_example_spark import datagen, serving
from data_pipeline_example_spark.conform import BATCH_SPEC, conform
from data_pipeline_example_spark.operators import retail, windows
from data_pipeline_example_spark.sources import read_csv_dir


def test_synthetic_transactions_schema_and_determinism(spark):
    df = datagen.synthetic_transactions(spark, days=3, tx_per_day=10)
    assert df.columns == [
        "order_id", "order_date", "store_id", "store_city",
        "product", "quantity", "unit_price", "amount",
    ]
    rows = df.collect()
    assert len(rows) == 30
    assert rows == datagen.synthetic_transactions(spark, days=3, tx_per_day=10).collect()
    r = rows[0]
    assert r["order_id"].startswith("20240101-")
    assert 1 <= r["quantity"] <= 5
    assert float(r["amount"]) == pytest.approx(float(r["unit_price"]) * r["quantity"], abs=0.01)


def test_generated_corpus_through_batch_pipeline(spark, tmp_path):
    datagen.generate(spark, str(tmp_path / "pos"), days=5, tx_per_day=20)
    raw = read_csv_dir(spark, str(tmp_path / "pos"))
    clean = conform(raw, BATCH_SPEC)
    daily = retail.daily_revenue(clean)
    got = {str(r["order_date"]) for r in daily.select("order_date").distinct().collect()}
    assert got == {f"2024-01-0{d}" for d in range(1, 6)}
    k = retail.kpis(clean).collect()[0]
    assert k["rows"] == 100
    assert k["grand_total"] > 0


def test_daily_payload_shape(spark):
    daily = spark.createDataFrame(
        [("2024-01-01", "A", 10.0), ("2024-01-01", "B", 5.0), ("2024-01-02", "A", 1.0)],
        ["order_date", "product", "total_amount"],
    ).withColumn("order_date", F.to_date("order_date"))
    p = serving.daily_payload(daily)
    assert p["status"] == "ok"
    assert [d["total_amount"] for d in p["daily"]] == [15.0, 1.0]
    assert p["top_products"][0] == {"product": "A", "total_amount": 11.0}
    assert len(p["sample"]) == 3


def test_stream_payload_shape(spark, sf_dir):
    from data_pipeline_example_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").alias("order_ts"),
        F.col("event_type").alias("product"),
        F.col("value").alias("amount"),
    )
    windowed = windows.sliding_window_agg(ev)
    p = serving.stream_payload(windowed)
    assert p["status"] == "ok"
    assert set(p) == {
        "status", "last_updated", "summary", "timeline", "leaderboard",
        "window_health", "raw_windows",
    }
    assert p["summary"]["unique_products"] >= 1
    assert p["last_updated"].endswith("Z")
    assert len(p["window_health"]) <= serving.MAX_WINDOWS
    assert len(p["timeline"]) <= serving.MAX_SERIES
    assert len(p["leaderboard"]) <= serving.MAX_LEADERBOARD
    # series totals equal the sum of their own points
    for s in p["timeline"]:
        assert s["total_revenue"] == pytest.approx(
            round(sum(pt["revenue"] for pt in s["points"]), 2), abs=0.02
        )


def test_stream_payload_empty(spark):
    empty = spark.createDataFrame(
        [], "product string, revenue double, window_start timestamp, window_end timestamp"
    )
    assert serving.stream_payload(empty) == {"status": "no_data"}
