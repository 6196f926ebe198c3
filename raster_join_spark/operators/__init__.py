from raster_join_spark.operators.spatial_join import (
    SpatialJoin,
    AggSpec,
)

__all__ = ["SpatialJoin", "AggSpec"]
