from data_pipeline_example_spark.functions import text, vectors

__all__ = ["text", "vectors"]
