"""data_pipeline_example_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
``ksubramanian9/Data_Pipeline_Example`` (surveyed in SURVEY.md), expressed
as composable, individually-testable Spark DataFrame operators rather than
monolithic scripts, plus LLM-data-pipeline extensions (dedup, similarity
search, text analysis, multimodal plumbing) designed for 100 TB scale.

Layout:
    session     SparkSession factory (UTC, AQE, dynamic partition overwrite)
    conform     schema-drift-tolerant normalization (the reference's
                signature data-model feature, SURVEY.md §1.3)
    sources     readers + input-readiness gate + streaming sources
    operators   batch/serving/windowed/TPC-H/dedup/text/similarity operators
    functions   reusable column-expression builders (text, vectors)
    streaming   Structured Streaming job (watermarked sliding windows)
    plans       query registry + DuckDB oracle SQL (driver contract)
"""

from data_pipeline_example_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
