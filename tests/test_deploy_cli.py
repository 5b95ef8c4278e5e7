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


def test_compose_files_wire_the_documented_services():
    """The shipped docker-compose files (the reference's one-command
    demo experience, r13 'Missing #2') must parse as YAML, and every
    service command must reference a real file in the repo with flags
    its CLI accepts."""
    import pathlib

    import yaml

    repo = pathlib.Path(__file__).resolve().parent.parent
    batch = yaml.safe_load((repo / "docker-compose.batch.yml").read_text())
    stream = yaml.safe_load((repo / "docker-compose.streaming.yml").read_text())

    assert set(batch["services"]) >= {
        "spark-master", "data-generator", "batch-pipeline", "dashboard",
    }
    assert set(stream["services"]) >= {
        "kafka", "event-generator", "stream-job", "streaming-dashboard",
        "file-event-generator", "stream-job-files",
    }
    for doc in (batch, stream):
        for name, svc in doc["services"].items():
            for arg in svc.get("command", []):
                if str(arg).startswith("/opt/engine/"):
                    rel = str(arg)[len("/opt/engine/"):]
                    assert (repo / rel).is_file(), (name, arg)


def test_datagen_cli_generates_daily_csvs(spark, tmp_path):
    """python datagen.py --output ... writes the reference layout."""
    import os

    from data_pipeline_example_spark import datagen

    out = str(tmp_path / "landing")
    assert datagen.main([
        "--output", out, "--days", "3", "--transactions-per-day", "4",
    ]) == 0
    days = [d for d in os.listdir(out) if d.startswith("day=")]
    assert len(days) == 3  # one daily CSV directory per day
    assert all(
        any(f.endswith(".csv") for f in os.listdir(os.path.join(out, d)))
        for d in days
    )


def test_replay_cli_file_mode_writes_ordered_batches(spark, tmp_path):
    """python replay.py --output ... (hermetic mode) writes one
    JSON-lines file per micro-batch."""
    import os

    from data_pipeline_example_spark.streaming import replay

    out = str(tmp_path / "events")
    assert replay.main([
        "--output", out, "--batches", "4", "--days", "2",
        "--transactions-per-day", "6",
    ]) == 0
    batches = [d for d in os.listdir(out) if d.startswith("batch=")]
    assert len(batches) == 4


def test_replay_cli_requires_a_sink():
    import pytest

    from data_pipeline_example_spark.streaming import replay

    with pytest.raises(SystemExit):
        replay.main(["--topic", "sales"])
