"""Batch sources: CSV/Parquet scans + the input-readiness gate.

Covers SURVEY.md §2.1 rows S1 (CSV directory scan,
`services/batch/pipeline_batch.py:115-119`), S5 (Parquet dataset scan,
`streaming_dashboard/app.py:61-66`) and S2 (readiness gate,
`pipeline_batch.py:68-107`).
"""

from __future__ import annotations

import glob
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_csv_dir(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    infer: bool = True,
) -> DataFrame:
    """S1 — read every ``*.csv`` under ``path`` (recursive, header row).

    Passing an explicit ``schema`` is preferred at scale: it skips the
    extra inference pass the reference pays (`pipeline_batch.py:116`)
    and keeps the scan single-job.
    """
    reader = (
        spark.read.option("header", True)
        .option("recursiveFileLookup", "true")
        .option("ignoreLeadingWhiteSpace", "true")
        .option("ignoreTrailingWhiteSpace", "true")
    )
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def ensure_session_confs(spark: SparkSession) -> None:
    """Apply the engine's semantics-critical confs to an externally-built
    session (the driver constructs its own SparkSession, so the factory
    defaults in session.py are not guaranteed). All three are
    runtime-settable SQLConfs:

    * nanosAsLong — testdata ``events.ts`` is parquet TIMESTAMP(NANOS),
      unreadable by Spark 4 otherwise;
    * UTC session TZ — reference parity (pipeline_batch.py:60) and
      cross-engine timestamp comparability;
    * ANSI off — Spark 3.5 null-on-error cast semantics that the
      conform operator's drift tolerance depends on.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S5 — scan one driver-provided parquet table.

    ``events.ts`` is parquet TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` it scans as nanos-since-epoch
    and is converted here via integer division to microseconds — the same
    truncation DuckDB applies reading TIMESTAMP_NS, keeping the two
    engines bit-identical.
    """
    ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load the full test-data star schema as a dict of DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def wait_for_input_files(
    spark: SparkSession,
    pattern: str,
    timeout_s: float = 300.0,
    poll_s: float = 5.0,
) -> int:
    """S2 — poll until ≥1 file matches ``pattern`` or timeout.

    Mirrors `pipeline_batch.py:68-107`: for non-local URIs it uses the
    Hadoop FileSystem API through the JVM gateway (works for hdfs://,
    s3a://, …); for local paths it uses glob.
    """
    deadline = time.monotonic() + timeout_s
    is_remote = "://" in pattern and not pattern.startswith("file://")
    while True:
        if is_remote:
            jvm = spark._jvm  # noqa: SLF001 — same technique as the reference
            hadoop_conf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
            p = jvm.org.apache.hadoop.fs.Path(pattern)
            fs = p.getFileSystem(hadoop_conf)
            statuses = fs.globStatus(p)
            n = len(statuses) if statuses is not None else 0
        else:
            n = len(glob.glob(pattern.removeprefix("file://"), recursive=True))
        if n > 0:
            return n
        if time.monotonic() >= deadline:
            raise TimeoutError(f"no input files matched {pattern!r} within {timeout_s}s")
        time.sleep(poll_s)


def read_json_dir(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
) -> DataFrame:
    """JSON-lines directory scan (the batch twin of the streaming S4
    decode path). Always pass a ``schema`` in production: schema
    inference reads the whole dataset once before the real scan — at
    100 TB that doubles the job. Unknown keys are dropped, missing keys
    are null, matching `streaming_sales_aggregator.py:187-200`'s
    tolerant contract.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_text_dir(
    spark: SparkSession,
    path: str,
    whole_file: bool = False,
    line_sep: str | None = None,
) -> DataFrame:
    """Plain-text corpus ingestion — the rawest LLM-corpus format.

    ``whole_file=False`` (default): one row per line (``value`` string),
    splittable, so a single 1 TB file still parallelizes by HDFS block.
    ``whole_file=True``: one row per file — document-per-file corpora;
    parallelism = file count, same contract as ``read_binary_dir``.
    ``line_sep`` overrides the record delimiter (e.g. ``"\\0"`` for
    NUL-delimited document dumps — a splittable document-per-record
    layout, unlike whole_file).
    """
    # options must ride the .text() call itself — DataFrameReader.text
    # re-applies its keyword defaults over any pre-set .option() values
    return spark.read.text(path, wholetext=whole_file, lineSep=line_sep)


def read_orc_dir(spark: SparkSession, path: str) -> DataFrame:
    """ORC dataset scan — same columnar pushdown/pruning contract as
    parquet (S5) for shops standardized on ORC."""
    return spark.read.orc(path)


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
) -> DataFrame:
    """Binary-file ingestion for multimodal corpora — Spark's
    ``binaryFile`` source yields (path, modificationTime, length,
    content:binary) per file, ready for the Arrow-batched decode /
    feature operators in ``operators/multimodal.py``.

    Scale notes: each file is one row read by one task, so ingest
    parallelism = file count (fine for media blobs); filters on
    ``length`` or the path are pushed into the file index, never
    opening filtered-out blobs. Very large single blobs should be
    sharded upstream — Spark caps a row comfortably in the tens of MB.
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
