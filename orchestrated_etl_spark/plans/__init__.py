"""Pipeline layer: declarative source → transforms → sink composition."""

from orchestrated_etl_spark.plans.pipeline import Pipeline, PipelineError, Stage

__all__ = ["Pipeline", "PipelineError", "Stage"]
