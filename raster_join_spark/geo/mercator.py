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

# ---------------------------------------------------------------- polynomials
#
# The forward transform needs sin(t) and atanh(s). libm transcendentals are
# NOT engine-portable (JVM Math vs DuckDB libm can differ in the last
# float64 ulp, and a JDK/libm update can flip a value near a float32
# rounding boundary — the repo's oracle-parity hard rule bans them).
# Instead both are evaluated as fixed Horner polynomials in basic IEEE ops
# (+,-,*; no division) with the SAME coefficient literals and operation
# order in numpy, Spark Column expressions, and generated SQL — so all
# three engines produce BIT-IDENTICAL float64, by IEEE determinism, at any
# accuracy. Accuracy vs true Mercator: sin is a 12-term Taylor series
# (exact to <1e-18 rel over |t| <= pi/2); the atanh odd series with 48
# terms is <1e-13 rel inside the continental-US band (|lat| <= 49.4, the
# operator's ingest domain, UsefulFuncs.cpp:579-583) and degrades to
# ~1e-8 rel at |lat| = 60 — far below the float32 narrowing either way.

_SIN_C = [(-1.0) ** n / float(math.factorial(2 * n + 1)) for n in range(12)]
_ATANH_C = [1.0 / float(2 * n + 1) for n in range(48)]


def _horner_np(u: np.ndarray, coeffs: list[float]) -> np.ndarray:
    p = np.full_like(u, coeffs[-1])
    for c in reversed(coeffs[:-1]):
        p = p * u + c
    return p


def _horner_col(u: Column, coeffs: list[float]) -> Column:
    p: Column = F.lit(coeffs[-1])
    for c in reversed(coeffs[:-1]):
        p = p * u + F.lit(c)
    return p


def _horner_sql(var: str, coeffs: list[float]) -> str:
    e = repr(coeffs[-1])
    for c in reversed(coeffs[:-1]):
        e = f"({e}) * {var} + {c!r}"
    return e


def _sin_np(t: np.ndarray) -> np.ndarray:
    return t * _horner_np(t * t, _SIN_C)


def _atanh_np(s: np.ndarray) -> np.ndarray:
    return s * _horner_np(s * s, _ATANH_C)


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
    """Utils.h:9-18: x=(lon+180)/360*256*2^22, y=(pi-atanh(sin(lat*pi/180)))/pi*128*2^22.

    ACCURACY DOMAIN: sin/atanh are evaluated as the engine-portable
    Horner polynomials (_SIN_C/_ATANH_C, shared verbatim with the SQL
    oracle), tuned for the continental-US band: relative error ~1e-13
    for |lat| <= 50, degrading to ~1e-8 at 60 deg and percent-level near
    85 deg. The lat=+/-90 special cases only pin the exact poles; between
    ~60 deg and the poles the series result is silently inaccurate — use
    a transcendental Mercator (not this oracle-parity path) for
    out-of-band latitudes."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    x = (lon + 180.0) / 360.0 * 256.0 * _SCALE
    y = np.where(
        lat == 90.0,
        256.0 * _SCALE,
        np.where(
            lat == -90.0,
            0.0,
            (np.pi - _atanh_np(_sin_np(lat * (np.pi / 180.0))))
            / np.pi
            * 128.0
            * _SCALE,
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

    sin/atanh run as the shared Horner polynomials (see module header) —
    basic IEEE ops only, bit-identical to geo2world_np and to the
    generated oracle SQL; everything stays JVM-side / codegen'd —
    replaces the reference's per-record C++ loop (Dataset.cpp:26-31) with
    a vectorized scan projection that Catalyst can pipeline with pushed
    filters.
    """
    keep = (
        (lat >= F.lit(bounds.minlat))
        & (lat <= F.lit(bounds.maxlat))
        & (lon >= F.lit(bounds.minlon))
        & (lon <= F.lit(bounds.maxlon))
    )
    cx, cy = world_center(bounds)
    x = (lon + F.lit(180.0)) / F.lit(360.0) * F.lit(256.0 * _SCALE) - F.lit(cx)
    t = lat * F.lit(math.pi / 180.0)
    s = t * _horner_col(t * t, _SIN_C)
    atanh = s * _horner_col(s * s, _ATANH_C)
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
