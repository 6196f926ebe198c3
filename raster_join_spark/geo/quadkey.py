"""Hierarchical quadtree tiling (Bing-maps quadkey scheme).

The north_star calls for H3/S2-style hierarchical cell ids; neither
library ships here, so the engine implements the classic quadkey scheme
from scratch: at zoom z the box splits into 2^z x 2^z tiles and a tile's
key is the base-4 string of interleaved (ty, tx) bits from the most
significant level down. Properties used by the engine:

- hierarchy by string prefix: parent = key[:-1]; all descendants of a
  tile share its key as a prefix -> rollups and containment are prefix
  operations (range scans on a sorted key — ideal as a partition/sort
  key at 10^12 rows)
- equal-area tiles in the planar space (like the reference's uniform
  grid, shaders/index.glsl:229-233, generalized to a pyramid — the same
  math as the reference's WORLD_ZOOM_LEVEL tiles, Utils.h:4)

All three implementations (numpy, Spark Column, ANSI SQL) use identical
integer arithmetic — exact parity for the oracle gate.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from raster_join_spark.geo.mercator import Bounds  # noqa: F401  (doc link)


def tile_xy_np(
    x: np.ndarray, y: np.ndarray, x0: float, y0: float, x1: float, y1: float, zoom: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(valid, tx, ty) integer tile coords at `zoom`."""
    n = 1 << zoom
    wx = (x1 - x0) / n
    wy = (y1 - y0) / n
    tx = np.floor((np.asarray(x, np.float64) - x0) / wx).astype(np.int64)
    ty = np.floor((np.asarray(y, np.float64) - y0) / wy).astype(np.int64)
    ok = (tx >= 0) & (tx < n) & (ty >= 0) & (ty < n)
    return ok, tx, ty


def quadkey_np(
    x: np.ndarray, y: np.ndarray, x0: float, y0: float, x1: float, y1: float, zoom: int
) -> np.ndarray:
    ok, tx, ty = tile_xy_np(x, y, x0, y0, x1, y1, zoom)
    out = np.full(len(tx), None, dtype=object)
    digits = []
    for level in range(zoom - 1, -1, -1):
        bx = (tx >> level) & 1
        by = (ty >> level) & 1
        digits.append((2 * by + bx).astype(np.int64))
    keys = np.array(["".join(str(int(d[i])) for d in digits) for i in range(len(tx))], dtype=object)
    out[ok] = keys[ok]
    return out


def quadkey_col(
    x: Column, y: Column, x0: float, y0: float, x1: float, y1: float, zoom: int
) -> Column:
    """Quadkey as a native column expression (unrolled per level; pure
    integer arithmetic inside codegen)."""
    n = 1 << zoom
    wx = (x1 - x0) / n
    wy = (y1 - y0) / n
    tx = F.floor((x.cast("double") - F.lit(x0)) / F.lit(wx)).cast("long")
    ty = F.floor((y.cast("double") - F.lit(y0)) / F.lit(wy)).cast("long")
    ok = (tx >= 0) & (tx < F.lit(n)) & (ty >= 0) & (ty < F.lit(n))
    parts = []
    for level in range(zoom - 1, -1, -1):
        bx = F.floor(tx / F.lit(1 << level)) % 2
        by = F.floor(ty / F.lit(1 << level)) % 2
        parts.append((F.lit(2) * by + bx).cast("string"))
    return F.when(ok, F.concat(*parts)).otherwise(F.lit(None))


def quadkey_sql(
    x_expr: str, y_expr: str, x0: float, y0: float, x1: float, y1: float, zoom: int
) -> str:
    """Identical arithmetic as ANSI SQL (DuckDB oracle)."""
    n = 1 << zoom
    wx = (x1 - x0) / n
    wy = (y1 - y0) / n
    tx = f"CAST(floor(({x_expr} - {x0!r}) / {wx!r}) AS BIGINT)"
    ty = f"CAST(floor(({y_expr} - {y0!r}) / {wy!r}) AS BIGINT)"
    parts = []
    for level in range(zoom - 1, -1, -1):
        bx = f"(CAST(floor({tx} / {1 << level}) AS BIGINT) % 2)"
        by = f"(CAST(floor({ty} / {1 << level}) AS BIGINT) % 2)"
        parts.append(f"CAST(2 * {by} + {bx} AS STRING)")
    concat = "concat(" + ", ".join(parts) + ")"
    return (
        f"(CASE WHEN {tx} >= 0 AND {tx} < {n} AND {ty} >= 0 AND {ty} < {n} "
        f"THEN {concat} ELSE NULL END)"
    )


def parent_key(key: Column, levels: int = 1) -> Column:
    """Hierarchy: ancestor key is a prefix (H3/S2 parent analogue)."""
    return F.substring(key, 1, F.length(key) - F.lit(levels))


def rollup_counts(df, key_col: str, to_zoom: int):
    """Aggregate per-tile counts up the pyramid: groupBy the `to_zoom`
    prefix — the hypertable-rollup pattern on a prefix-hierarchical key."""
    return (
        df.groupBy(F.substring(F.col(key_col), 1, to_zoom).alias(key_col))
        .agg(F.sum("cnt").alias("cnt"))
    )
