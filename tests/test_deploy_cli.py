"""DEPLOY.md contract: the documented spark-submit argument vectors
must parse — no session, no broker, just the CLI surface."""

from __future__ import annotations

import pytest

from data_pipeline_example_spark import pipeline
from data_pipeline_example_spark.streaming import job


def test_batch_cli_parses_documented_invocation():
    args = pipeline.build_arg_parser().parse_args(
        [
            "--input", "hdfs://namenode:8020/landing/csv",
            "--output", "hdfs://namenode:8020/curated/daily_parquet",
            "--csv-output", "hdfs://namenode:8020/serving/dashboard_csv",
            "--wait-for-input", "--show-kpis",
        ]
    )
    assert args.input.endswith("/landing/csv")
    assert args.wait_for_input and args.show_kpis
    assert args.csv_output.endswith("/dashboard_csv")


def test_batch_cli_requires_input_and_output():
    with pytest.raises(SystemExit):
        pipeline.build_arg_parser().parse_args(["--input", "x"])


def test_streaming_cli_parses_documented_kafka_invocation():
    args = job.build_arg_parser().parse_args(
        [
            "--source", "kafka", "--bootstrap", "kafka:9092", "--topic", "sales",
            "--starting-offsets", "latest",
            "--output", "hdfs://namenode:8020/curated/windowed_parquet",
            "--checkpoint", "hdfs://namenode:8020/checkpoints/windowed",
        ]
    )
    assert args.source == "kafka" and args.bootstrap == "kafka:9092"
    assert args.topic == "sales" and args.starting_offsets == "latest"


def test_streaming_cli_parses_hermetic_json_invocation():
    args = job.build_arg_parser().parse_args(
        [
            "--source", "json", "--input-path", "/landing/events",
            "--output", "/curated/windowed_parquet", "--checkpoint", "/ckpt/windowed",
        ]
    )
    assert args.source == "json" and args.input_path == "/landing/events"


def test_streaming_cli_rejects_bad_source():
    with pytest.raises(SystemExit):
        job.build_arg_parser().parse_args(
            ["--source", "pulsar", "--output", "o", "--checkpoint", "c"]
        )
