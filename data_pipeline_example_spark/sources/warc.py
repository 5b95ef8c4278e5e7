"""WARC ingestion as a PySpark Python DataSource.

WARC (ISO 28500) is the archive format LLM web corpora ship in
(Common Crawl et al.). Spark has no native reader, and this is exactly
what the Spark 4 Python DataSource API is for: a pure-Python source
that parallelizes by file, pickles cleanly to executors, and needs no
JVM-side code. Register once per session and it behaves like any
built-in format:

    spark.dataSource.register(WarcDataSource)
    df = spark.read.format("warc").load("/corpus/*.warc.gz")

Design notes (the 100 TB contract):

* **Partitioning** — one input partition per WARC file; Common Crawl
  ships ~1 GB segment files by convention, so parallelism = segment
  count, the same contract as ``binaryFile``/``wholetext``. A single
  monolithic ``.warc.gz`` cannot be split (gzip members don't carry
  offsets a planner could seek to without an external index); shard
  upstream, as every crawl pipeline already does.
* **Gzip** — ``.gz`` files are read through :mod:`gzip`, which
  transparently concatenates the per-record gzip members Common Crawl
  uses; plain ``.warc`` streams work unchanged.
* **Projection/filters** — Spark prunes columns and applies filters
  above this source. Record-level work here is header parsing only;
  payload bytes are sliced, never decoded — decoding is an operator
  concern (``operators/text.py`` / ``multimodal.py``).
* **Malformed records** — a truncated tail record yields what was
  readable and stops the file (crawl archives routinely end mid-record
  after transfer truncation); header lines that don't split on ':'
  are skipped, matching the tolerant contract of real WARC readers.

No reference analogue (the reference reads CSV/Kafka only —
`services/batch/pipeline_batch.py:115-119`); this extends the engine's
source surface for the LLM-corpus use case.
"""

from __future__ import annotations

import glob as _glob
import gzip
import io
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WARC_SCHEMA = StructType(
    [
        StructField("warc_record_id", StringType()),
        StructField("warc_type", StringType()),
        StructField("target_uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("content_type", StringType()),
        StructField("content_length", LongType()),
        StructField("payload", BinaryType()),
        StructField("source_file", StringType()),
    ]
)


def _open_stream(path: str) -> io.BufferedReader:
    if path.endswith(".gz"):
        return gzip.open(path, "rb")  # type: ignore[return-value]
    return open(path, "rb")


def iter_warc_records(stream: io.BufferedReader, source_file: str) -> Iterator[tuple]:
    """Yield one tuple per WARC record, in WARC_SCHEMA column order.

    Parses the version line + header block (terminated by an empty
    line), then reads exactly Content-Length payload bytes and the
    record-separating blank lines. Pure sequential reads — works on
    any non-seekable stream (gzip members, pipes)."""
    while True:
        # skip inter-record blank lines; EOF → done
        line = stream.readline()
        if not line:
            return
        if line.strip() == b"":
            continue
        if not line.startswith(b"WARC/"):
            # not a record boundary (garbage between records) — skip
            continue
        headers: dict[str, str] = {}
        while True:
            h = stream.readline()
            if not h or h.strip() == b"":
                break
            if b":" not in h:
                continue  # tolerant: skip malformed header lines
            k, _, v = h.partition(b":")
            headers[k.strip().decode("ascii", "replace").lower()] = (
                v.strip().decode("utf-8", "replace")
            )
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        payload = stream.read(length)
        # truncated tail record: emit what was readable, but report the
        # ACTUAL payload size so content_length == len(payload) always
        # holds — downstream slicing by content_length must never
        # over-read (the header-claimed length is gone with the bytes)
        yield (
            headers.get("warc-record-id"),
            headers.get("warc-type"),
            headers.get("warc-target-uri"),
            headers.get("warc-date"),
            headers.get("content-type"),
            len(payload),
            payload,
            source_file,
        )
        if len(payload) < length:
            return


class _WarcPartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class WarcReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.pattern = options.get("path")
        if not self.pattern:
            raise ValueError("warc source requires a path")

    def partitions(self) -> Sequence[InputPartition]:
        paths = sorted(_glob.glob(self.pattern.removeprefix("file://"), recursive=True))
        if not paths:
            raise FileNotFoundError(f"no WARC files match {self.pattern!r}")
        return [_WarcPartition(p) for p in paths]

    def read(self, partition: _WarcPartition) -> Iterator[tuple]:
        with _open_stream(partition.path) as stream:
            yield from iter_warc_records(stream, partition.path)


class WarcDataSource(DataSource):
    """``spark.read.format("warc").load(pattern)`` — see module docs."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> StructType:
        return WARC_SCHEMA

    def reader(self, schema: StructType) -> WarcReader:
        return WarcReader(self.options)


def read_warc(spark, pattern: str):
    """Convenience: register (idempotent) + load in one call.

    Only the duplicate-registration error is swallowed; any other
    registration failure (unsupported Spark version, conflicting
    source) propagates with its root cause instead of resurfacing
    later as a confusing "format warc not found".
    """
    try:
        spark.dataSource.register(WarcDataSource)
    except Exception as exc:  # re-register in the same session is fine
        # match ONLY the duplicate-registration condition — a broad
        # "already" substring can mask unrelated failures whose message
        # happens to contain the word (e.g. a path or state description)
        error_class = getattr(exc, "getErrorClass", lambda: None)() or ""
        if (
            "DATA_SOURCE_ALREADY_EXISTS" not in str(exc)
            and "DATA_SOURCE_ALREADY_EXISTS" not in error_class
        ):
            raise
    return spark.read.format("warc").load(pattern)


def warc_documents(df):
    """HTTP ``response`` records → the ``documents`` shape the text/dedup
    operators consume: (doc_id, url, fetched_at, text, source).

    Pure column expressions above the Python source — the HTTP header
    block is cut at the first CRLFCRLF, tags are regex-stripped, and
    whitespace collapsed (the honest baseline; a production extractor
    like trafilatura slots in as an Arrow-batched ``mapInPandas`` the
    same way the multimodal decoders do). doc_id is the xxhash64 of the
    WARC record id — deterministic, collision-safe at corpus scale;
    records MISSING a record id fall back to a composite key
    (source_file:uri:date) so they don't all collapse onto
    xxhash64(NULL) and get silently merged by exact-dedup downstream.
    """
    from pyspark.sql import functions as F

    s = F.decode(F.col("payload"), "UTF-8")
    body = F.when(
        F.locate("\r\n\r\n", s) > 0,
        F.expr("substring(decode(payload, 'UTF-8'), locate('\r\n\r\n', decode(payload, 'UTF-8')) + 4)"),
    ).otherwise(s)
    text = F.trim(
        F.regexp_replace(
            F.regexp_replace(body, r"<[^>]*>", " "), r"\s+", " "
        )
    )
    return (
        df.filter(F.col("warc_type") == "response")
        .select(
            F.xxhash64(
                F.coalesce(
                    F.col("warc_record_id"),
                    F.concat_ws(
                        ":", F.col("source_file"), F.col("target_uri"), F.col("warc_date")
                    ),
                )
            ).alias("doc_id"),
            F.col("target_uri").alias("url"),
            F.col("warc_date").alias("fetched_at"),
            text.alias("text"),
            F.col("source_file").alias("source"),
        )
    )
