"""Query façade with the reference's API shape.

Mirrors the reference's query object and driver
(RasterJoin/db/DataHandler.hpp:14-41, Common.h:20-39, main.cpp:120-176)
so a raster-join user can port a workload mechanically:

    reference                                   here
    ---------                                   ----
    DataHandler::setPolygonQuery(name)          engine.set_polygon_query(polyset)
    DataHandler::executeQuery(bbox, t0, t1)     engine.execute_query(box, t0, t1)
    DataHandler::setQueryConstraints(...)       engine.set_query_constraints([...])
    DataHandler::setAggregation(Avg, attr)      engine.set_aggregation(Aggregation.AVG, attr)
    GLHandler::executeFunction(fn)              engine.execute_function("raster"|"index"|
                                                  "hybrid"|"errorbounds"|"cpu")

The coarse sigma (executeQuery) narrows to grid cells overlapping the
query window — a SUPERSET exactly like HashGridIndex::queryIndex
(HashGridIndex.cpp:78-137); constraints are conjunctive EQ/LT/LTE/GT/GTE
over typed attributes (Common.h:22,34-39); "cpu" maps to the same fused
exact plan as hybrid (the reference's CPU join J5 is its oracle — here
the hybrid plan IS the CPU join shape, per-task partials + merge).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from raster_join_spark.geo.grid import GridSpec
from raster_join_spark.geo.polygons import PolygonSet
from raster_join_spark.operators.spatial_join import AggSpec, SpatialJoin


class ConstraintType(Enum):  # Common.h:22
    EQ = 0
    LT = 1
    LTE = 2
    GT = 3
    GTE = 4


class Aggregation(Enum):  # Common.h:26
    COUNT = 0
    AVG = 1
    SUM = 2


@dataclass(frozen=True)
class QueryConstraint:  # Common.h:34-39
    attr: str
    op: ConstraintType
    value: object

    def to_column(self) -> Column:
        c = F.col(self.attr)
        if self.op is ConstraintType.EQ:
            return c == F.lit(self.value)
        if self.op is ConstraintType.LT:
            return c < F.lit(self.value)
        if self.op is ConstraintType.LTE:
            return c <= F.lit(self.value)
        if self.op is ConstraintType.GT:
            return c > F.lit(self.value)
        return c >= F.lit(self.value)


@dataclass
class QueryEngine:
    """DataHandler-shaped driver over a points DataFrame."""

    spark: SparkSession
    points: DataFrame
    grid: GridSpec
    polyset: PolygonSet | None = None
    constraints: list[QueryConstraint] = field(default_factory=list)
    agg: AggSpec = field(default_factory=AggSpec)
    _window: DataFrame | None = None

    # ----------------------------------------------------- query setup

    def set_polygon_query(self, polyset: PolygonSet) -> "QueryEngine":
        self.polyset = polyset
        return self

    def set_query_constraints(self, constraints: list[QueryConstraint]) -> "QueryEngine":
        self.constraints = list(constraints)
        return self

    def set_aggregation(self, agg: Aggregation, attr: str | None = None) -> "QueryEngine":
        if agg is Aggregation.COUNT:
            self.agg = AggSpec("count", None, "agg")
        elif agg is Aggregation.AVG:
            assert attr, "AVG needs an attribute (DataHandler.cpp:68-71)"
            self.agg = AggSpec("avg", attr, "agg")
        else:
            assert attr, "SUM needs an attribute"
            self.agg = AggSpec("sum", attr, "agg")
        return self

    def execute_query(
        self,
        box: tuple[float, float, float, float] | None = None,
        t0: str | None = None,
        t1: str | None = None,
        ts_col: str = "warc_ts",
    ) -> "QueryEngine":
        """Coarse sigma: cell-granular superset of the query window
        (HashGridIndex.cpp:78-137). If box is None, uses the polygon
        collection's bbox like the reference (main.cpp:131-134)."""
        sj = self._sj()
        if box is None:
            assert self.polyset is not None
            box = self.polyset.bbox
        win = sj.coarse_scan(self.points, *box)
        if t0 is not None:
            win = win.filter(F.col(ts_col) >= F.lit(t0).cast("timestamp_ntz"))
        if t1 is not None:
            win = win.filter(F.col(ts_col) <= F.lit(t1).cast("timestamp_ntz"))
        self._window = win
        return self

    # ------------------------------------------------------- execution

    def _sj(self) -> SpatialJoin:
        assert self.polyset is not None, "set_polygon_query first"
        return SpatialJoin(self.spark, self.polyset, self.grid)

    def _filtered(self) -> DataFrame:
        df = self._window if self._window is not None else self.points
        for c in self.constraints:
            df = df.filter(c.to_column())
        return df

    def execute_function(self, fn: str) -> DataFrame:
        """fn codes per GLHandler.cpp:228 / CPUJoin.cpp:146-151:
        raster | index | hybrid | errorbounds | cpu."""
        sj = self._sj()
        pts = self._filtered()
        if fn == "raster":
            return sj.raster_join(pts, self.agg)
        if fn == "index":
            return sj.index_join(pts, self.agg)
        if fn == "hybrid":
            return sj.hybrid_join(pts, self.agg)
        if fn == "cpu":
            # J5: identical semantics; the fused plan IS the CPU-join shape
            return sj.hybrid_join(pts, self.agg, fused=True)
        if fn == "errorbounds":
            return sj.error_bounds(pts)
        raise ValueError(f"unknown join type {fn!r}")
