from raster_join_spark.sources.pages import (
    PAGES_CTE,
    POINTS_CTE,
    pages_df,
    points_df,
    register_views,
)

__all__ = ["PAGES_CTE", "POINTS_CTE", "pages_df", "points_df", "register_views"]
