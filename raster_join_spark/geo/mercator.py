"""Web-Mercator world-coordinate transform (zoom 22), continental-US bounds.

Reimplements, vectorized, the reference's closed forms:
- geo2world / world2geo            (RasterJoin/common/Utils.h:9-23)
- transformPoint (US box filter + center-relative world coords)
                                   (RasterJoin/common/UsefulFuncs.cpp:578-607)
- getGroundResolution              (Utils.h:25-27, UsefulFuncs.cpp:625-632)

Two implementations with identical semantics:
- numpy (driver-side: polygon transforms, oracles, unit tests)
- pyspark Column expressions (executor-side: stays in whole-stage codegen,
  no Python in the hot path)

The reference computes the transform in double then narrows the stored
coordinates to float32 (TaxiRecord.hpp:121-133). ``transform_points_np``
mirrors that: float64 math, optional float32 narrowing of the result.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

WORLD_ZOOM_LEVEL = 22.0
_SCALE = math.pow(2.0, WORLD_ZOOM_LEVEL)  # exp2(22)


@dataclass(frozen=True)
class Bounds:
    minlat: float
    minlon: float
    maxlat: float
    maxlon: float

    @property
    def center(self) -> tuple[float, float]:
        return ((self.minlat + self.maxlat) / 2, (self.minlon + self.maxlon) / 2)


# Continental-US box, UsefulFuncs.cpp:579-583
US_BOUNDS = Bounds(24.396308, -124.848974, 49.384358, -66.885444)


def geo2world_np(lat: np.ndarray, lon: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Utils.h:9-18: x=(lon+180)/360*256*2^22, y=(pi-atanh(sin(lat*pi/180)))/pi*128*2^22."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    x = (lon + 180.0) / 360.0 * 256.0 * _SCALE
    with np.errstate(divide="ignore"):  # atanh(±1) at the poles, handled below
        y = np.where(
            lat == 90.0,
            256.0 * _SCALE,
            np.where(
                lat == -90.0,
                0.0,
                (np.pi - np.arctanh(np.sin(lat * np.pi / 180.0))) / np.pi * 128.0 * _SCALE,
            ),
        )
    return x, y


def world2geo_np(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Utils.h:19-23."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lat = np.arctan(np.sinh(np.pi * (1.0 - y / _SCALE / 128.0))) * 180.0 / np.pi
    lon = x * 360.0 / _SCALE / 256.0 - 180.0
    return lat, lon


def world_center(bounds: Bounds = US_BOUNDS) -> tuple[float, float]:
    clat, clon = bounds.center
    cx, cy = geo2world_np(np.array([clat]), np.array([clon]))
    return float(cx[0]), float(cy[0])


def transform_points_np(
    lat: np.ndarray,
    lon: np.ndarray,
    bounds: Bounds = US_BOUNDS,
    float32: bool = True,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """transformPoint (UsefulFuncs.cpp:578-597): returns (keep_mask, x, y).

    Points outside the lat/lon box are masked out (mask False); coordinates
    are world coords relative to the box center, narrowed to float32 like
    the reference's stored Location attribute.
    """
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    keep = (
        (lat >= bounds.minlat)
        & (lat <= bounds.maxlat)
        & (lon >= bounds.minlon)
        & (lon <= bounds.maxlon)
    )
    cx, cy = world_center(bounds)
    x, y = geo2world_np(lat, lon)
    x = x - cx
    y = y - cy
    if float32:
        x = x.astype(np.float32)
        y = y.astype(np.float32)
    return keep, x, y


def geo2world_cols(
    lat: Column, lon: Column, bounds: Bounds = US_BOUNDS
) -> tuple[Column, Column, Column]:
    """Spark-native transform: (keep, x, y) Column expressions.

    atanh(z) = 0.5*ln((1+z)/(1-z)); everything stays JVM-side / codegen'd —
    replaces the reference's per-record C++ loop (Dataset.cpp:26-31) with a
    vectorized scan projection that Catalyst can pipeline with pushed filters.
    """
    keep = (
        (lat >= F.lit(bounds.minlat))
        & (lat <= F.lit(bounds.maxlat))
        & (lon >= F.lit(bounds.minlon))
        & (lon <= F.lit(bounds.maxlon))
    )
    cx, cy = world_center(bounds)
    x = (lon + F.lit(180.0)) / F.lit(360.0) * F.lit(256.0 * _SCALE) - F.lit(cx)
    s = F.sin(lat * F.lit(math.pi / 180.0))
    atanh = F.lit(0.5) * F.log((F.lit(1.0) + s) / (F.lit(1.0) - s))
    y = (F.lit(math.pi) - atanh) / F.lit(math.pi) * F.lit(128.0 * _SCALE) - F.lit(cy)
    # narrow to float32 to match the reference's stored Location type
    return keep, x.cast("float"), y.cast("float")


def ground_resolution(bounds: Bounds = US_BOUNDS, level: float = WORLD_ZOOM_LEVEL) -> float:
    """Meters per world unit at box-center latitude (Utils.h:25-27)."""
    clat, _ = bounds.center
    return math.cos(clat * math.pi / 180.0) * 6378137.0 * 2.0 * math.pi / math.pow(2.0, 8 + level)


def epsilon_to_cell_size(epsilon_m: float, bounds: Bounds = US_BOUNDS) -> float:
    """GLFunction.cpp:26-30: cellSize = (eps/sqrt(2)) / groundResolution."""
    return (epsilon_m / math.sqrt(2.0)) / ground_resolution(bounds)
