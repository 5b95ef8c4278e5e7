from data_pipeline_example_spark.sources.warc import (
    WarcDataSource,
    read_warc,
    warc_documents,
)
from data_pipeline_example_spark.sources.tables import (
    TABLE_NAMES,
    load_table,
    load_tables,
    read_csv_dir,
    read_binary_dir,
    read_json_dir,
    read_orc_dir,
    read_text_dir,
    wait_for_input_files,
)

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "read_csv_dir",
    "read_binary_dir",
    "read_json_dir",
    "read_orc_dir",
    "read_text_dir",
    "WarcDataSource",
    "read_warc",
    "warc_documents",
    "wait_for_input_files",
]
