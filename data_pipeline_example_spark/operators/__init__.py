from data_pipeline_example_spark.operators import (
    dedup,
    multimodal,
    retail,
    similarity,
    text,
    tpch,
    users,
    windows,
)

__all__ = [
    "dedup",
    "multimodal",
    "retail",
    "similarity",
    "text",
    "tpch",
    "users",
    "windows",
]
