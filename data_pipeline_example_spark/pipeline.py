"""End-to-end batch pipeline — the rebuild of
`services/batch/pipeline_batch.py` (SURVEY.md §3.1) as a composition of
the engine's operators instead of a monolithic script.

Flow: readiness gate → CSV scan → conform (batch spec) → daily revenue
aggregate + single-pass KPIs → partitioned Parquet + dashboard CSV + KPI
CSV + console.

Differences from the reference, all deliberate (SURVEY.md §7.2):
* one scan, no redundant actions — the reference recomputes the CSV
  scan up to 5× (`rdd.isEmpty()`, two diagnostic ``count()``s, three
  writes with no cache); here the conformed frame is cached once,
  row-drop diagnostics ride on ``df.observe`` metrics, and the empty
  check is ``df.isEmpty()``;
* KPI row count comes from the same aggregate, not a separate action;
* the yyyyMMdd date fallback actually works (P5 regex fix).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_example_spark import sinks
from data_pipeline_example_spark.conform import BATCH_SPEC, conform
from data_pipeline_example_spark.operators import retail
from data_pipeline_example_spark.sources import read_csv_dir, wait_for_input_files


@dataclass
class BatchResult:
    daily: DataFrame
    kpis: DataFrame
    observed_metrics: dict


def run_batch_pipeline(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    csv_output_path: str | None = None,
    wait_for_input: bool = False,
    show_kpis: bool = False,
) -> BatchResult | None:
    """Run the full batch flow. Returns None on empty input (exit-0
    parity with `pipeline_batch.py:126-129`)."""
    from pyspark.sql import Observation

    if wait_for_input:
        wait_for_input_files(spark, input_path.rstrip("/") + "/**/*.csv")

    raw = read_csv_dir(spark, input_path)
    if raw.isEmpty():
        return None

    obs = Observation("conform_metrics")
    clean = conform(raw, BATCH_SPEC, observation=obs).cache()
    try:
        daily = retail.daily_revenue(clean)
        kpis = retail.kpis(clean)

        sinks.write_partitioned_parquet(daily, output_path)
        if csv_output_path:
            sinks.write_single_csv(daily, csv_output_path)
            sinks.write_kpi_csv(kpis, csv_output_path)
        if show_kpis:
            sinks.show_kpis(kpis)

        # populated by the first action above — one job, no extra counts
        return BatchResult(daily=daily, kpis=kpis, observed_metrics=obs.get)
    finally:
        clean.unpersist()


def build_arg_parser():
    """spark-submit CLI for the batch job — the DEPLOY.md twin of the
    reference's `spark-app` compose service (`docker-compose.batch.yml:
    215-224`, which submits `pipeline_batch.py` with in-code defaults).
    Exposed separately so deployment commands can be smoke-tested
    without building a session."""
    import argparse

    p = argparse.ArgumentParser(
        prog="pipeline", description="batch retail pipeline (CSV in, parquet+CSV out)"
    )
    p.add_argument("--input", required=True, help="CSV landing directory")
    p.add_argument("--output", required=True, help="partitioned parquet output path")
    p.add_argument("--csv-output", default=None, help="dashboard CSV directory")
    p.add_argument(
        "--wait-for-input", action="store_true",
        help="poll for input files before scanning (S2 readiness gate)",
    )
    p.add_argument("--show-kpis", action="store_true", help="print the KPI row")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_arg_parser().parse_args(argv)
    from data_pipeline_example_spark.session import get_spark

    spark = get_spark(app_name="batch-pipeline")
    try:
        result = run_batch_pipeline(
            spark,
            input_path=args.input,
            output_path=args.output,
            csv_output_path=args.csv_output,
            wait_for_input=args.wait_for_input,
            show_kpis=args.show_kpis,
        )
        del result  # result unused: empty input also exits 0 (reference parity)
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
