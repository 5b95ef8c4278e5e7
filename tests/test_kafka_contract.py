"""Kafka contract tests — hermetic, no broker, no connector jar.

The sandbox has neither a Kafka broker nor the spark-sql-kafka connector
(ref `streaming_sales_aggregator.py:307-318` and
`kafka_event_producer.py:40-47` assume both), so these tests pin the
*contract*: the exact reader/writer options the engine wires, and the
payload plan the producer serializes. Live-broker integration is out of
CI scope by design; a cluster with the connector exercises
`read_stream("kafka")` / `write_kafka` unchanged through these same
option dicts.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from data_pipeline_example_spark.streaming.job import kafka_reader_options
from data_pipeline_example_spark.streaming.replay import (
    kafka_writer_options,
    to_kafka_payload,
)


def test_reader_options_reference_parity():
    opts = kafka_reader_options("broker:9092", "sales", "earliest")
    # the reference's exact source wiring (streaming_sales_aggregator.py:307-318)
    assert opts == {
        "kafka.bootstrap.servers": "broker:9092",
        "subscribe": "sales",
        "startingOffsets": "earliest",
        "failOnDataLoss": "false",
    }


def test_reader_options_defaults():
    opts = kafka_reader_options()
    assert opts["startingOffsets"] == "latest"
    assert opts["subscribe"] == "sales"
    assert opts["failOnDataLoss"] == "false"


def test_writer_options():
    assert kafka_writer_options("b:9092", "t") == {
        "kafka.bootstrap.servers": "b:9092",
        "topic": "t",
    }


def test_kafka_payload_value_only(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    out = to_kafka_payload(df)
    assert out.columns == ["value"]
    rows = {json.loads(r["value"])["id"] for r in out.collect()}
    assert rows == {1, 2}


def test_kafka_payload_keyed(spark):
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    out = to_kafka_payload(df, key_col="id")
    assert out.columns == ["key", "value"]
    row = out.collect()[0]
    assert row["key"] == "1"
    assert json.loads(row["value"]) == {"id": 1, "name": "a"}


def test_kafka_reader_plan_builds_or_reports_missing_connector(spark):
    """read_stream('kafka') must fail ONLY for the missing connector jar
    in this sandbox (DATA_SOURCE_NOT_FOUND), never for anything in our
    wiring; where the jar exists the plan must build."""
    from data_pipeline_example_spark.streaming.job import read_stream

    try:
        raw = read_stream(spark, "kafka", kafka_bootstrap="b:9092", topic="t")
    except Exception as exc:  # noqa: BLE001 - asserting the failure class
        assert "kafka" in str(exc).lower() and (
            "failed to find" in str(exc).lower()
            or "data_source_not_found" in str(exc).lower()
        ), f"unexpected failure building kafka plan: {exc}"
    else:
        assert raw.isStreaming
        assert "value" in raw.columns
