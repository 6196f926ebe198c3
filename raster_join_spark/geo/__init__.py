from raster_join_spark.geo.grid import GridSpec
from raster_join_spark.geo.polygons import PolygonSet
from raster_join_spark.geo.mercator import (
    US_BOUNDS,
    geo2world_np,
    world2geo_np,
    transform_points_np,
    geo2world_cols,
    ground_resolution,
)

__all__ = [
    "GridSpec",
    "PolygonSet",
    "US_BOUNDS",
    "geo2world_np",
    "world2geo_np",
    "transform_points_np",
    "geo2world_cols",
    "ground_resolution",
]
