from data_pipeline_example_spark.operators import (
    dedup,
    multimodal,
    retail,
    similarity,
    text,
    tpch,
    windows,
)

__all__ = ["dedup", "multimodal", "retail", "similarity", "text", "tpch", "windows"]
