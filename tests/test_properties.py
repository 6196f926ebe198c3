"""Property-based tests (hypothesis): PIP vs literal C-rule transcription,
grid/quadkey invariants. Pure numpy — no Spark session."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from raster_join_spark.geo.grid import GridSpec
from raster_join_spark.geo.pip import pip_mask
from raster_join_spark.geo.quadkey import quadkey_np

coord = st.floats(
    min_value=-1000, max_value=1000, allow_nan=False, allow_infinity=False
)


def c_rule(x: float, y: float, verts: np.ndarray) -> bool:
    """Literal transcription of the reference crossing loop
    (shaders/index.glsl:47-67 / GridIndexF.cpp:383-402)."""
    nvert = len(verts)
    c = False
    j = nvert - 1
    for i in range(nvert):
        vix, viy = float(verts[i][0]), float(verts[i][1])
        vjx, vjy = float(verts[j][0]), float(verts[j][1])
        if (viy > y) != (vjy > y) and x < (vjx - vix) * (y - viy) / (vjy - viy) + vix:
            c = not c
        j = i
    return c


@settings(max_examples=200, deadline=None)
@given(
    poly=st.lists(st.tuples(coord, coord), min_size=3, max_size=12),
    pts=st.lists(st.tuples(coord, coord), min_size=1, max_size=20),
)
def test_pip_matches_reference_rule(poly, pts):
    verts = np.asarray(poly, dtype=np.float64)
    px = np.asarray([p[0] for p in pts])
    py = np.asarray([p[1] for p in pts])
    got = pip_mask(px, py, verts)
    for i, (x, y) in enumerate(pts):
        assert got[i] == c_rule(x, y, verts)


@settings(max_examples=200, deadline=None)
@given(
    x=st.floats(min_value=0, max_value=99.999, allow_nan=False),
    y=st.floats(min_value=0, max_value=99.999, allow_nan=False),
)
def test_cell_id_consistent_with_rect(x, y):
    g = GridSpec(0.0, 0.0, 2.5, 2.5, 40, 40)
    cid = int(g.cell_ids_np(np.array([x]), np.array([y]))[0])
    assert cid >= 0
    lbx, lby, rtx, rty = g.cell_rect(cid)
    assert lbx <= x < rtx or np.isclose(x, rtx)
    assert lby <= y < rty or np.isclose(y, rty)


@settings(max_examples=100, deadline=None)
@given(
    x=st.floats(min_value=0, max_value=1023.999, allow_nan=False),
    y=st.floats(min_value=0, max_value=1023.999, allow_nan=False),
    z1=st.integers(min_value=1, max_value=10),
    z2=st.integers(min_value=1, max_value=10),
)
def test_quadkey_prefix_property(x, y, z1, z2):
    lo, hi = min(z1, z2), max(z1, z2)
    ka = quadkey_np(np.array([x]), np.array([y]), 0.0, 0.0, 1024.0, 1024.0, lo)[0]
    kb = quadkey_np(np.array([x]), np.array([y]), 0.0, 0.0, 1024.0, 1024.0, hi)[0]
    assert kb.startswith(ka)
    assert len(ka) == lo and len(kb) == hi


def test_accuracy_sweep_artifact_invariants():
    """The committed ε-sweep artifact (tools/accuracy_sweep.py, mirroring
    experiments/run-scripts/raster-accuracy.ps1:21-27) must satisfy the
    paper's invariants: the whole-pixel GUARANTEED interval contains the
    exact count for every polygon at every ε and its total width is
    monotone non-increasing as ε shrinks (the ε-bound itself — the
    realized |raster-exact| error may fluctuate per instance, so only its
    coarsest-to-finest trend is asserted), and the tight micro-unit
    interval sits inside the whole-pixel one."""
    import csv
    import pathlib
    from collections import defaultdict

    path = pathlib.Path(__file__).resolve().parent.parent / "BENCH" / "accuracy_sweep.csv"
    rows = list(csv.DictReader(open(path)))
    assert rows, "accuracy sweep artifact missing/empty"
    tot_err = defaultdict(int)
    tot_width = defaultdict(int)
    for r in rows:
        eps = int(r["eps_mdeg"])
        exact, lo1, hi1 = int(r["exact"]), int(r["lo1"]), int(r["hi1"])
        lo_u6, hi_u6 = int(r["lo_u6"]), int(r["hi_u6"])
        assert lo1 <= exact <= hi1, r
        assert lo1 * 1_000_000 <= lo_u6 <= hi_u6 <= hi1 * 1_000_000, r
        tot_err[eps] += int(r["abs_err"])
        tot_width[eps] += hi1 - lo1
    eps_desc = sorted(tot_width, reverse=True)
    widths = [tot_width[e] for e in eps_desc]
    assert all(a >= b for a, b in zip(widths, widths[1:])), widths
    assert tot_err[eps_desc[-1]] < tot_err[eps_desc[0]], dict(tot_err)
