from autoscan_spark.plans.pipeline import extract_pipeline

__all__ = ["extract_pipeline"]
