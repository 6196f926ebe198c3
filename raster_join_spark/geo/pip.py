"""Vectorized ray-casting point-in-polygon.

Exact reimplementation of the reference's crossing rule, identical in all
four of its engines (RasterJoin/shaders/index.glsl:47-67,
shaders/hybrid.glsl:57-77, shaders/index.frag:19-39,
CPUJoin/GridIndexF.cpp:383-402):

    for each edge (vi, vj):
        if ((vi.y > y) != (vj.y > y))
           and (x < (vj.x - vi.x) * (y - vi.y) / (vj.y - vi.y) + vi.x):
            inside = not inside

The rule is half-open: points exactly on a horizontal edge / certain
boundary configurations resolve asymmetrically; we preserve that, so the
engine, the numpy oracle, and the generated SQL oracle agree bit-for-bit.

``dtype`` selects float32 (reference storage precision, for parity tests
against reference CSVs) or float64 (engine default; matches the SQL
oracle's double arithmetic exactly because the operation order is the
same IEEE sequence).
"""

from __future__ import annotations

import numpy as np


def pip_mask(
    px: np.ndarray,
    py: np.ndarray,
    verts: np.ndarray,
    dtype=np.float64,
) -> np.ndarray:
    """Boolean mask: which of the points lie inside the single polygon.

    px, py: (N,) point coords. verts: (V, 2) polygon vertices (no closing
    vertex). Loops over EDGES (small) with (N,) vector ops per edge and
    straddle-compression: the division — the expensive op — runs only on
    the points whose y straddles the edge (~a quarter of rows for typical
    shapes). Elementwise IEEE op order is identical to the naive form, so
    results stay bit-compatible with the generated SQL oracle.
    """
    px = np.ascontiguousarray(px, dtype=dtype)
    py = np.ascontiguousarray(py, dtype=dtype)
    v = np.asarray(verts, dtype=dtype)
    n = len(px)
    c = np.zeros(n, dtype=bool)
    nv = len(v)
    j = nv - 1
    for i in range(nv):
        vix, viy = v[i, 0], v[i, 1]
        vjx, vjy = v[j, 0], v[j, 1]
        j = i
        straddle = (viy > py) != (vjy > py)
        idx = np.flatnonzero(straddle)
        if len(idx) == 0:
            continue
        ys = py[idx]
        # (vjy - viy) != 0 whenever straddle holds, so no div-by-zero
        xcross = (vjx - vix) * (ys - viy) / (vjy - viy) + vix
        c[idx] ^= px[idx] < xcross
    return c


def pip_multi(
    px: np.ndarray,
    py: np.ndarray,
    verts: np.ndarray,
    offsets: np.ndarray,
    poly_ids: np.ndarray | None = None,
    dtype=np.float64,
) -> tuple[np.ndarray, np.ndarray]:
    """Test points against many polygons (CSR layout).

    verts: (TotalV, 2) flat vertex array; offsets: (P+1,) CSR starts
    (PolyHandler.cpp:49-80's ``polys``/``pindexes`` shape). Returns
    (point_idx, poly_id) pairs for every containment. Used by the exact
    refinement pandas UDF and by the brute-force oracle.
    """
    n_poly = len(offsets) - 1
    if poly_ids is None:
        poly_ids = np.arange(n_poly, dtype=np.int64)
    out_pts: list[np.ndarray] = []
    out_pids: list[np.ndarray] = []
    for p in range(n_poly):
        pv = verts[offsets[p] : offsets[p + 1]]
        if len(pv) < 3:
            continue
        m = pip_mask(px, py, pv, dtype=dtype)
        idx = np.nonzero(m)[0]
        if len(idx):
            out_pts.append(idx)
            out_pids.append(np.full(len(idx), poly_ids[p], dtype=np.int64))
    if not out_pts:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(out_pts), np.concatenate(out_pids)


def pip_candidates(
    px: np.ndarray,
    py: np.ndarray,
    cand_poly: np.ndarray,
    verts: np.ndarray,
    offsets: np.ndarray,
    dtype=np.float64,
) -> np.ndarray:
    """Per-row PIP where row i is tested only against its candidate polygon
    cand_poly[i] (the shape the grid-index probe produces,
    shaders/index.glsl:186-249). Vectorized by grouping rows by polygon.

    Returns a boolean mask aligned with the input rows.

    Two physical forms, same bit-exact results (selection is purely a
    performance heuristic):

    - GROUPED (few distinct polygons, e.g. a 16-polygon fixture): rows
      are grouped by candidate polygon (one argsort), each group runs
      the edge-loop pip_mask with SCALAR vertices — the per-edge vectors
      stay cache-resident and the division only runs on straddling rows.
    - FLAT (many tiny groups, e.g. 65k polygons where each batch touches
      thousands of polygons with a handful of rows each): one pass per
      edge index per distinct vertex count, vectorized across ALL
      candidate rows with GATHERED vertices — the grouped form's
      per-group Python overhead (~µs/group) would dominate there
      (measured 40µs/pair at 65k polygons, ~100x the flat form).

    Both evaluate the identical elementwise IEEE expression in the same
    order, so results are bit-equal to pip_mask and the SQL oracle at
    either dtype.
    """
    px = np.asarray(px, dtype=dtype)
    py = np.asarray(py, dtype=dtype)
    cand_poly = np.asarray(cand_poly, dtype=np.int64)
    out = np.zeros(len(px), dtype=bool)
    if len(px) == 0:
        return out
    order = np.argsort(cand_poly, kind="stable")
    sorted_p = cand_poly[order]
    starts = np.nonzero(np.r_[True, sorted_p[1:] != sorted_p[:-1]])[0]
    n_groups = len(starts)
    if n_groups > 64 and len(px) < n_groups * 256:
        return _pip_candidates_flat(px, py, cand_poly, verts, offsets, dtype)
    ends = np.r_[starts[1:], len(sorted_p)]
    for s, e in zip(starts, ends):
        p = int(sorted_p[s])
        rows = order[s:e]
        pv = verts[offsets[p] : offsets[p + 1]]
        if len(pv) < 3:
            continue
        out[rows] = pip_mask(px[rows], py[rows], pv, dtype=dtype)
    return out


def _pip_candidates_flat(
    px: np.ndarray,
    py: np.ndarray,
    cand_poly: np.ndarray,
    verts: np.ndarray,
    offsets: np.ndarray,
    dtype=np.float64,
) -> np.ndarray:
    """The many-tiny-groups form of pip_candidates: rows bucketed by
    their polygon's VERTEX COUNT (a handful of distinct values), then
    one vectorized pass per edge index with per-row gathered vertices —
    the batch-classifier technique (classify.py) applied to the PIP
    kernel. Same elementwise IEEE sequence as pip_mask, including the
    straddle-compressed division, so bit-equal at either dtype."""
    vx = np.ascontiguousarray(verts[:, 0], dtype=dtype)
    vy = np.ascontiguousarray(verts[:, 1], dtype=dtype)
    offsets = np.asarray(offsets, dtype=np.int64)
    out = np.zeros(len(px), dtype=bool)
    nv_per = np.diff(offsets)[cand_poly]
    for nv in np.unique(nv_per):
        nv = int(nv)
        if nv < 3:
            continue
        sel = np.flatnonzero(nv_per == nv)
        base = offsets[cand_poly[sel]]
        xx, yy = px[sel], py[sel]
        c = np.zeros(len(sel), dtype=bool)
        j = nv - 1
        for i in range(nv):
            vix, viy = vx[base + i], vy[base + i]
            vjx, vjy = vx[base + j], vy[base + j]
            j = i
            straddle = (viy > yy) != (vjy > yy)
            idx = np.flatnonzero(straddle)
            if len(idx) == 0:
                continue
            ys = yy[idx]
            # (vjy - viy) != 0 whenever straddle holds — no div-by-zero
            xcross = (
                (vjx[idx] - vix[idx]) * (ys - viy[idx]) / (vjy[idx] - viy[idx])
                + vix[idx]
            )
            c[idx] ^= xx[idx] < xcross
        out[sel] = c
    return out


def pip_sql(x_expr: str, y_expr: str, verts: np.ndarray, float32: bool = False) -> str:
    """Generate the identical crossing rule as an ANSI-SQL boolean
    expression for ONE polygon — one CASE term per edge, XOR-folded by
    summing 1-bits and testing parity. Used to build DuckDB oracles that
    reproduce the engine's PIP decisions exactly (same double-precision
    op order as pip_mask).

    ``float32=True`` emits the reference-precision twin: every vertex
    literal is pre-rounded to float32 and CAST AS REAL, so (DuckDB REAL
    arithmetic being true IEEE float32, verified) each intermediate is
    the same float32 value pip_mask(dtype=np.float32) computes — the
    caller must likewise feed REAL-cast point exprs."""
    v = np.asarray(verts, dtype=np.float64)
    if float32:
        v32 = v.astype(np.float32)

        def lit(val) -> str:
            return f"CAST({float(val)!r} AS REAL)"

        vlit = [(lit(v32[i, 0]), lit(v32[i, 1])) for i in range(len(v))]
    else:
        vlit = [(repr(float(v[i, 0])), repr(float(v[i, 1]))) for i in range(len(v))]
    terms = []
    nv = len(v)
    for i in range(nv):
        j = (i - 1) % nv
        vix, viy = vlit[i]
        vjx, vjy = vlit[j]
        terms.append(
            f"(CASE WHEN (({viy} > {y_expr}) <> ({vjy} > {y_expr})) "
            f"AND ({x_expr} < ({vjx} - {vix}) * ({y_expr} - {viy}) / ({vjy} - {viy}) + {vix}) "
            f"THEN 1 ELSE 0 END)"
        )
    return "((" + " + ".join(terms) + ") % 2 = 1)"
