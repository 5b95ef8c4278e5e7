"""Event replay harness — capability parity with the reference's Kafka
producer (`services/event-generator/kafka_event_producer.py`, SURVEY.md
rows K5/P14/S7).

The reference replays transaction CSVs onto a Kafka topic one JSON
message at a time with wall-clock rate limiting. Here the same dataflow
is expressed over DataFrames:

* P14 event-time injection: ``event_time`` = first present of
  (order_ts, order_time, order_date, timestamp) else a fixed injection
  time (the reference uses the wall clock; a parameter keeps tests
  deterministic — `kafka_event_producer.py:84-93`).
* S7 row hygiene: keys/values trimmed, all-empty rows skipped
  (`kafka_event_producer.py:72-82`).
* Sink: JSON-lines batch files for the engine's hermetic file-source
  streaming path (one file per micro-batch → `maxFilesPerTrigger=1`
  reproduces replay ordering), or a Kafka writer when a broker exists.

Rate limiting / infinite looping are driver-side concerns of a demo
producer, not of the engine; batching replaces them here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVENT_TIME_CANDIDATES = ("order_ts", "order_time", "order_date", "timestamp")


def to_events(transactions: DataFrame, injection_time: str = "1970-01-01T00:00:00") -> DataFrame:
    """Transaction rows → event rows with ``event_time`` injected (P14)
    and string values trimmed (S7). All columns become nullable strings,
    matching the producer's JSON payloads."""
    cols = transactions.columns
    out = transactions.select(
        *[F.trim(F.col(c).cast("string")).alias(c.strip().lower()) for c in cols]
    )
    present = [c for c in EVENT_TIME_CANDIDATES if c in out.columns]
    # the producer skips falsy values, not just missing keys
    # (`kafka_event_producer.py:86-91`) — nullify empty strings so the
    # coalesce falls through them
    event_time = (
        F.coalesce(*[F.nullif(F.col(c), F.lit("")) for c in present], F.lit(injection_time))
        if present
        else F.lit(injection_time)
    )
    out = out.withColumn("event_time", event_time)
    # skip rows where every original field is empty/null (S7);
    # greatest() needs >=2 args, so a single-column table uses the bare
    # predicate and a zero-column one (nothing to judge) keeps all rows
    preds = [
        F.col(c).isNotNull() & (F.col(c) != "") for c in out.columns if c != "event_time"
    ]
    if not preds:
        return out
    any_value = preds[0] if len(preds) == 1 else F.greatest(*preds)
    return out.filter(any_value)


def write_event_batches(
    events: DataFrame, path: str, num_batches: int = 1, order_col: str | None = None
) -> None:
    """JSON-lines files for the file-source streaming path: one file per
    batch (``maxFilesPerTrigger=1`` then replays them in order). Batch
    assignment is deterministic when ``order_col`` is given (ntile over
    the ordered stream); otherwise true round-robin over a row_number —
    every batch id 0..num_batches-1 is non-empty whenever the input has
    at least num_batches rows. (monotonically_increasing_id can't do
    this: its ids are partition-offset based, so pmod over them skews
    with the partitioning and can leave batch ids empty.) Both paths
    funnel through a single-task window — fine for a replay harness
    that's generating demo micro-batches, not a 100 TB write path."""
    from pyspark.sql.window import Window

    if order_col is not None:
        batched = events.withColumn(
            "batch", F.ntile(num_batches).over(Window.orderBy(order_col)) - 1
        )
    else:
        batched = events.withColumn(
            "batch",
            F.pmod(
                F.row_number().over(Window.orderBy(F.monotonically_increasing_id())) - 1,
                num_batches,
            ),
        )
    batched.repartition("batch").write.mode("overwrite").partitionBy("batch").json(path)


def kafka_writer_options(bootstrap: str, topic: str) -> dict[str, str]:
    """The Kafka sink contract (K5), as data — split out so CI can
    assert it without a broker or the spark-sql-kafka connector jar
    (`kafka_event_producer.py:40-47` wires the same pair)."""
    return {"kafka.bootstrap.servers": bootstrap, "topic": topic}


def to_kafka_payload(events: DataFrame, key_col: str | None = None) -> DataFrame:
    """Rows → the (key?, value) JSON frame the Kafka sink serializes —
    the plan half of ``write_kafka``, runnable (and tested) hermetically."""
    value = F.to_json(F.struct(*[F.col(c) for c in events.columns]))
    if key_col is not None:
        return events.select(
            F.col(key_col).cast("string").alias("key"), value.alias("value")
        )
    return events.select(value.alias("value"))


def write_kafka(
    events: DataFrame, bootstrap: str, topic: str, key_col: str | None = None
) -> None:
    """K5 — Kafka sink for environments with a broker: rows serialized as
    JSON values (`df.write.format("kafka")`). The payload plan and the
    option contract are CI-tested (`to_kafka_payload`,
    `kafka_writer_options`); this composition needs a live broker."""
    (
        to_kafka_payload(events, key_col)
        .write.format("kafka")
        .options(**kafka_writer_options(bootstrap, topic))
        .save()
    )


def main(argv: list[str] | None = None) -> int:
    """CLI twin of the reference's event-generator service
    (`services/event-generator/kafka_event_producer.py`, wired by
    `docker-compose.streaming.yml`): synthesize transactions, inject
    event time, and replay them — to a Kafka topic when ``--bootstrap``
    is given, else as ordered JSON-lines batch files for the hermetic
    file-source path."""
    import argparse

    from data_pipeline_example_spark.datagen import synthetic_transactions
    from data_pipeline_example_spark.session import get_spark

    p = argparse.ArgumentParser(description="Replay synthetic events")
    p.add_argument("--bootstrap", default=None, help="Kafka bootstrap servers")
    p.add_argument("--topic", default="sales")
    p.add_argument("--output", default=None, help="JSON-lines batch dir (file mode)")
    p.add_argument("--batches", type=int, default=10)
    p.add_argument("--days", type=int, default=30)
    p.add_argument("--transactions-per-day", type=int, default=48, dest="tx_per_day")
    p.add_argument("--seed", type=int, default=2024)
    p.add_argument("--master", default=None, help="spark master override")
    args = p.parse_args(argv)
    if not args.bootstrap and not args.output:
        p.error("one of --bootstrap (kafka mode) or --output (file mode) is required")

    spark = get_spark(app_name="event-replay", master=args.master)
    events = to_events(
        synthetic_transactions(spark, args.days, args.tx_per_day, args.seed)
    )
    if args.bootstrap:
        write_kafka(events, args.bootstrap, args.topic)
    else:
        write_event_batches(
            events, args.output, num_batches=args.batches, order_col="event_time"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
