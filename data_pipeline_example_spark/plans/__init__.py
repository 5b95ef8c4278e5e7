from data_pipeline_example_spark.plans.oracles import ORACLES
from data_pipeline_example_spark.plans.queries import QUERIES, flagship

__all__ = ["ORACLES", "QUERIES", "flagship"]
