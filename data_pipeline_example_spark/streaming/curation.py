"""Streaming corpus ingestion — the continuous twin of the batch
curation pipeline (`curation.py`): documents arrive as a stream (Kafka
topic / landing directory), and each micro-batch is quality-gated,
exact-deduplicated with bounded state, and fanned out into
context-length chunks ready for a training-shard sink.

This is how a 100 TB corpus is *built* in practice — continuously, not
as one batch job: crawler output lands all day, and the curation
decisions (quality, dedup, chunking) run incrementally with watermarked
state instead of re-scanning the accumulated corpus. The near-dup and
decontamination stages stay batch (`curation.curation_stages`) — they
need corpus-wide candidate joins, which is exactly the cut point
between streaming ingest and periodic batch refinement.

Hermetically testable via the json file source (no Kafka in CI), same
contract as `streaming/job.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql import SparkSession
from pyspark.sql.types import StringType, StructField, StructType

from data_pipeline_example_spark.functions import text as T
from data_pipeline_example_spark.operators import text

# landing-zone contract mirrors streaming/job.py's EVENT_SCHEMA
# philosophy: every field arrives as a nullable string, typing happens
# in the decode step (schema drift tolerance)
DOC_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("text", StringType()),
        StructField("ingest_ts", StringType()),
    ]
)


def read_doc_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """JSON-lines landing directory → raw document stream (the Kafka
    twin is `job.read_stream("kafka")` + `from_json(DOC_SCHEMA)`)."""
    reader = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def decode_doc_stream(raw: DataFrame) -> DataFrame:
    """Landing-zone JSON docs → typed stream: doc_id long, text string,
    ingest_ts timestamp (event time for the dedup watermark)."""
    return raw.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("text").cast("string").alias("text"),
        F.to_timestamp("ingest_ts").alias("ingest_ts"),
    )


def curate_doc_stream(
    docs: DataFrame,
    min_quality: float = 0.05,
    min_tokens: int = 10,
    watermark: str = "1 hour",
    chunk_size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """quality gate → stateful exact dedup → chunk fan-out, all
    incremental.

    * Quality/token gating is pure column arithmetic (same expressions
      as the batch `text.doc_stats`) — stateless, runs per micro-batch.
    * Exact dedup keys on the normalized md5 fingerprint with
      ``dropDuplicatesWithinWatermark``: state holds one entry per
      distinct document seen inside the watermark horizon and is
      evicted after it — bounded, unlike a naive stream-wide distinct.
      A duplicate arriving after the horizon re-enters the corpus; the
      periodic batch `curation` pass sweeps those (the standard
      lambda-style split).
    * Chunking is the batch operator with ``widen_input=False`` — a
      generator expression, stateless, so the stream stays append-only.

    Output: doc_id, chunk_id, n_tokens, chunk_hash, ingest_ts.
    """
    n_tok = T.token_count(F.col("text"))
    gated = docs.filter(
        (T.quality_score(F.col("text")) >= min_quality) & (n_tok >= min_tokens)
    )
    deduped = (
        gated.withColumn("fingerprint", T.fingerprint(F.col("text")))
        .withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )
    return text.chunk_documents(
        deduped,
        chunk_size=chunk_size,
        stride=stride,
        widen_input=False,
        carry=("ingest_ts",),
    )
