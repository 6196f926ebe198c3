"""Shared fixtures for the driver's correctness gate and the test suite.

Coordinate space: integer microdegrees (x = lonmic, y = latmic) over the
continental-US box (UsefulFuncs.cpp:579-583 scaled by 1e6). Everything —
polygon vertices, grid origins, cell sizes — is an exact integer in
float64, so engine (numpy/pandas UDF), Spark SQL, and DuckDB agree
bit-for-bit; PIP's one division is the same IEEE op in all three.

Two polygon collections:
- ORACLE_POLYS: 16 irregular radial blobs (12 across the US box + 4 small
  ones inside the NYC-style hot cluster where 30% of points land —
  exercises skew), integer vertices, used by oracle-gated queries.
- micro fixture: the reference's own 5-point/2-polygon sample
  (RasterJoin/test/baseline.hpp:139-217) for kernel parity tests.
"""

from __future__ import annotations

import numpy as np

from raster_join_spark.geo.grid import GridSpec
from raster_join_spark.geo.polygons import PolygonSet, blob_polygons

# ------------------------------------------------------------- boxes/grids

X0, Y0 = -124_500_000.0, 24_500_000.0
X1, Y1 = -67_500_000.0, 48_500_000.0

# coarse grid: 0.25 deg cells (228 x 96 = 21,888 cells) — index/hybrid/knn
COARSE_GRID = GridSpec(X0, Y0, 250_000.0, 250_000.0, 228, 96)
# fine grid: 0.05 deg cells (1140 x 480 = 547,200 cells) — raster/bounds
FINE_GRID = GridSpec(X0, Y0, 50_000.0, 50_000.0, 1140, 480)

# NYC-style hot box (30% of synthesized points land here)
HOT_X0, HOT_X1 = -74_200_000.0, -73_800_000.0
HOT_Y0, HOT_Y1 = 40_500_000.0, 40_900_000.0


def _round_int(ps: PolygonSet, name: str) -> PolygonSet:
    polys = [
        [(float(round(x)), float(round(y))) for x, y in ps.poly_verts(p)]
        for p in range(ps.n_polys)
    ]
    return PolygonSet.from_list(polys, name=name)


def oracle_polyset() -> PolygonSet:
    """16 polygons: 12 spread over the US box, 4 inside the hot cluster."""
    wide = blob_polygons(12, X0, Y0, X1, Y1, n_verts=8, seed=101)
    hot = blob_polygons(4, HOT_X0, HOT_Y0, HOT_X1, HOT_Y1, n_verts=7, seed=202)
    polys = [
        [(float(x), float(y)) for x, y in wide.poly_verts(p)]
        for p in range(wide.n_polys)
    ] + [
        [(float(x), float(y)) for x, y in hot.poly_verts(p)]
        for p in range(hot.n_polys)
    ]
    return _round_int(PolygonSet.from_list(polys), name="oracle16")


ORACLE_POLYS = oracle_polyset()

# kNN query points (exact integers, inside the box; q2 in the hot cluster)
KNN_QUERIES: list[tuple[int, float, float]] = [
    (0, -118_000_000.0, 34_000_000.0),
    (1, -87_600_000.0, 41_800_000.0),
    (2, -74_000_000.0, 40_700_000.0),
    (3, -95_300_000.0, 29_700_000.0),
]
KNN_K = 5


# ---------------------------------------------------- micro test fixture

def micro_fixture() -> tuple[np.ndarray, np.ndarray, PolygonSet]:
    """The reference's baseLineSample (baseline.hpp:139-217): 5 points
    (3 at (5,5), 2 at (5.15,5.15)); poly0=[5.1,5.2]^2, poly1=[4.9,5.1]^2."""
    px = np.array([5.0, 5.0, 5.0, 5.15, 5.15])
    py = np.array([5.0, 5.0, 5.0, 5.15, 5.15])
    polys = PolygonSet.from_list(
        [
            [(5.1, 5.1), (5.2, 5.1), (5.2, 5.2), (5.1, 5.2)],
            [(4.9, 4.9), (5.1, 4.9), (5.1, 5.1), (4.9, 5.1)],
        ],
        name="micro",
    )
    return px, py, polys
