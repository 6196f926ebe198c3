from raster_join_spark.plans.checkpoint import CheckpointedJob

__all__ = ["CheckpointedJob"]
