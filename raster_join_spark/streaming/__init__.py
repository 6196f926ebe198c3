from raster_join_spark.streaming.windowed import (
    stream_points,
    windowed_cell_counts,
    streaming_polygon_counts,
)

__all__ = ["stream_points", "windowed_cell_counts", "streaming_polygon_counts"]
