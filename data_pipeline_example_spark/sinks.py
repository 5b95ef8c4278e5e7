"""Batch sinks — SURVEY.md §2.2 rows K1/K2/K3/K6 and §2.12 M1/M2.

Mirrors the reference's storage contract (`services/batch/pipeline_batch.py:
215-237`): date-partitioned Parquet with dynamic partition overwrite for
the curated aggregate, single-file CSV for the dashboard, single-row KPI
CSV to a ``<out>_kpis`` sibling.

Scale notes: ``repartition(partition_col)`` before a partitioned write
produces one file per partition (reference behavior, fine when partitions
are day-sized); at 100 TB prefer ``partition_file_target`` > 1 so each
date partition writes multiple right-sized files in parallel instead of
funneling a whole day through one task. ``coalesce(1)`` sinks exist for
demo parity only — never use them on large outputs (the docstring is the
guardrail the reference lacked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_col: str = "order_date",
    partition_file_target: int = 1,
) -> None:
    """K1 + M1 — dynamic-overwrite date-partitioned Parquet
    (`pipeline_batch.py:215-221`, config `:59`).

    ``partition_file_target=1`` reproduces the reference's one file per
    date; larger values salt the shuffle key so each date's rows spread
    over ~N writer tasks → ~N files per date partition (use
    ceil(partition_bytes / 128MB) at scale). Dynamic partition
    overwrite is a per-writer option, not a session-conf mutation.
    """
    if partition_file_target == 1:
        out = df.repartition(partition_col)
    else:
        # (date, salt) composite shuffle key: rows of one date land on
        # ~partition_file_target distinct reducers; bucket count stays
        # spark.sql.shuffle.partitions (NOT partition_file_target, which
        # would cap the whole write at that many tasks)
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(partition_file_target)
        )
        out = df.repartition(F.col(partition_col), salt)
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )


def write_single_csv(df: DataFrame, path: str) -> None:
    """K2 + M2 — coalesce(1) CSV with header (`pipeline_batch.py:223-230`).

    Demo/serving parity only: the single task funnels the entire
    DataFrame — do not use above dashboard scale.
    """
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)


def write_kpi_csv(kpis: DataFrame, out_path: str) -> None:
    """K3 — single-row KPI CSV to ``<out>_kpis`` (`pipeline_batch.py:234-237`)."""
    write_single_csv(kpis, out_path.rstrip("/") + "_kpis")


def show_kpis(kpis: DataFrame) -> None:
    """K6 — console sink (`pipeline_batch.py:233`)."""
    kpis.show(truncate=False)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed parquet table for co-located joins (100 TB pattern the
    reference never needed: two facts bucketed+sorted on the join key
    sort-merge-join with NO shuffle exchange on either side — the
    dominant cost of a fact-fact join at scale disappears on every
    subsequent query).

    Uses ``saveAsTable`` (bucketing metadata lives in the catalog; plain
    ``.parquet(path)`` writes cannot record it).
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
