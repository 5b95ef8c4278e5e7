"""Live Kafka round-trip — OPT-IN, the one §2 surface CI can't prove.

The hermetic contract tests (test_kafka_contract.py) pin the reader/
writer option dicts and the payload plan; this module closes the last
gap — an actual broker round-trip through ``write_kafka`` →
``read_stream("kafka")`` → decode → conform → windowed aggregation —
wherever a broker exists. It is skipped (with reason) unless
``SPARK_KAFKA_BOOTSTRAP`` is set, so CI here stays hermetic.

Running it for real needs two things on the host:
  1. a reachable broker:      export SPARK_KAFKA_BOOTSTRAP=host:9092
  2. the Kafka connector on the session classpath, e.g.
     PYSPARK_SUBMIT_ARGS="--packages org.apache.spark:\
spark-sql-kafka-0-10_2.13:<spark-version> pyspark-shell" python -m pytest \
       -m kafka tests/test_kafka_roundtrip.py

See DEPLOY.md ("Kafka round-trip verification") for the full recipe.
"""

from __future__ import annotations

import os
import uuid

import pytest

from data_pipeline_example_spark.streaming import job, replay

BOOTSTRAP = os.environ.get("SPARK_KAFKA_BOOTSTRAP")

pytestmark = [
    pytest.mark.kafka,
    pytest.mark.skipif(
        not BOOTSTRAP,
        reason="live-broker test: set SPARK_KAFKA_BOOTSTRAP=host:9092 "
        "(and put spark-sql-kafka on the classpath) to run",
    ),
]


def test_kafka_roundtrip_end_to_end(spark, tmp_path):
    """Produce with write_kafka, consume with read_stream('kafka'),
    assert finalized window contents — the exact production wiring."""
    topic = f"sales_rt_{uuid.uuid4().hex[:8]}"

    # two A-sales at 10:00/10:05 (land in the same four sliding
    # windows), plus a 13:00 flush event that advances the watermark
    # (12:45) past those windows' ends so append mode emits them
    rows = [
        ("A", "2025-01-01T10:00:00", "5.0"),
        ("A", "2025-01-01T10:05:00", "7.0"),
        ("FLUSH", "2025-01-01T13:00:00", "1.0"),
    ]
    events = spark.createDataFrame(
        rows, "product string, event_time string, total_price string"
    )
    replay.write_kafka(events, BOOTSTRAP, topic)

    raw = job.read_stream(
        spark,
        "kafka",
        kafka_bootstrap=BOOTSTRAP,
        topic=topic,
        starting_offsets="earliest",
    )
    agg = job.build_aggregations(job.transform_orders(job.decode_json(raw)))
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = job.write_stream(agg, out_dir, ckpt, available_now=True)
    q.awaitTermination(180)

    got = spark.read.parquet(out_dir).filter("product = 'A'").collect()
    # 1h window sliding 15m → each event belongs to 4 windows; both
    # events share all 4 (10:00 and 10:05 are inside the same set)
    assert len(got) == 4
    assert all(float(r["revenue"]) == 12.0 for r in got)
    starts = sorted(str(r["window_start"]) for r in got)
    assert starts[0].endswith("09:15:00") and starts[-1].endswith("10:00:00")
