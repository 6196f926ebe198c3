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


def alt_polyset() -> PolygonSet:
    """A second, disjointly-seeded collection for the multi-collection
    catalog gate (the reference's per-query collection switch,
    PolyHandler.cpp:20-40): 6 polygons over the US box + 2 in the hot
    cluster, integer-rounded vertices like oracle16 so the generated
    SQL oracle is bit-exact."""
    wide = blob_polygons(6, X0, Y0, X1, Y1, n_verts=9, seed=303)
    hot = blob_polygons(2, HOT_X0, HOT_Y0, HOT_X1, HOT_Y1, n_verts=6, seed=404)
    polys = [
        [(float(x), float(y)) for x, y in wide.poly_verts(p)]
        for p in range(wide.n_polys)
    ] + [
        [(float(x), float(y)) for x, y in hot.poly_verts(p)]
        for p in range(hot.n_polys)
    ]
    return _round_int(PolygonSet.from_list(polys), name="alt8")


ALT_POLYS = alt_polyset()

# ------------------------------------------------ multi-ring (hole) fixture


def hole_polyset() -> PolygonSet:
    """3 donut polygons (outer rectangle + square hole) built through the
    reference's MULTI-RING text path: rings FLATTEN into one vertex run
    per polygon (PolyHandler.cpp:49-80 pindexes; readPolygons 133-176
    concatenates rings into one PolygonF), so the crossing-parity PIP
    sees two phantom diagonal edges per donut (outer-last -> hole-first
    and hole-last -> outer-first). The engine reproduces that rule
    bug-for-bug — points in the hole count OUTSIDE; points in the sliver
    between the two phantom diagonals also flip (4 crossings), exactly
    as the reference GPU shader computes (shaders/line-bound.frag:195-209).
    Bounds are integer+0.5 floats: no integer-microdegree point sits on
    an axis-aligned edge; diagonal-edge arithmetic is inexact but
    IEEE-identical across numpy/Spark/DuckDB (basic ops, same order).
    Donut 0 straddles the NYC hot cluster so the skew path is exercised."""

    def donut(x0, y0, x1, y1, hx0, hy0, hx1, hy1):
        return [
            [(x0, y0), (x1, y0), (x1, y1), (x0, y1)],
            [(hx0, hy0), (hx1, hy0), (hx1, hy1), (hx0, hy1)],
        ]

    polys = [
        donut(
            -74_150_000.5, 40_550_000.5, -73_850_000.5, 40_850_000.5,
            -74_050_000.5, 40_650_000.5, -73_950_000.5, 40_750_000.5,
        ),
        donut(
            -120_000_000.5, 33_000_000.5, -110_000_000.5, 40_000_000.5,
            -117_000_000.5, 35_000_000.5, -113_000_000.5, 38_000_000.5,
        ),
        donut(
            -95_000_000.5, 30_000_000.5, -85_000_000.5, 38_000_000.5,
            -92_000_000.5, 32_000_000.5, -88_000_000.5, 36_000_000.5,
        ),
    ]
    return PolygonSet.from_rings(polys, name="holes3")


HOLE_POLYS = hole_polyset()


# ------------------------------------------ many-polygon scaling fixture

# 64 x 64 = 4096 axis-aligned rectangles with half-unit-offset bounds:
# slot sizes (57e6/64 = 890625, 24e6/64 = 375000) and insets are chosen
# so every rect bound is an exact (integer + 0.5) float64 — no integer-
# microdegree point and no cell center can ever lie ON an edge, which
# makes the ray-cast PIP decision equal the closed-form range test
# bit-for-bit (the oracle uses the closed form; the ENGINE still runs
# the full generic classify/PIP machinery over all 4096 polygons — the
# point of the fixture is a polygon-count scale test under the exact
# gate, the reference's second scaling axis, raster-polygons.ps1:22-27).
RECT_SIDE = 64
RECT_INSET_X = 100_000.5
RECT_INSET_Y = 50_000.5

_RECT_CACHE: dict[int, PolygonSet] = {}


def rect_polyset(side: int = RECT_SIDE) -> PolygonSet:
    """side^2 inset rectangles tiling the US box, poly_id = i + side*j
    (row-major, matching the oracle's closed-form id arithmetic)."""
    ps = _RECT_CACHE.get(side)
    if ps is not None:
        return ps
    sw = (X1 - X0) / side
    sh = (Y1 - Y0) / side
    polys = []
    for j in range(side):
        for i in range(side):
            rx0 = X0 + i * sw + RECT_INSET_X
            rx1 = X0 + (i + 1) * sw - RECT_INSET_X
            ry0 = Y0 + j * sh + RECT_INSET_Y
            ry1 = Y0 + (j + 1) * sh - RECT_INSET_Y
            polys.append([(rx0, ry0), (rx1, ry0), (rx1, ry1), (rx0, ry1)])
    ps = PolygonSet.from_list(polys, name=f"rect{side * side}")
    _RECT_CACHE[side] = ps
    return ps


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
