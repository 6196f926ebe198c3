"""Result writers + aggregation-encoding parity helpers (reference X1/A2).

- write_poly_results: per-polygon TSV ``polyId \\t value`` ordered by
  polygon id, the reference's output format
  (RasterJoin/main.cpp:195-225, file name ``raster_<endTime>_<eps>.csv``)
- write_error_bounds: 5-column interval file
  (``poly, agg-fp, agg+fn, agg-fp1, agg+fn1`` — main.cpp:178-193)
- encode_sum_hi_lo / decode_avg_hi_lo: the reference's atomic-friendly
  int split of float sums (hi = int(v)/100, lo = (v-100*hi)*10; avg =
  (hi*100 + lo/10)/count — shaders/polygon.frag:19-25 and
  main.cpp:203-223). Spark sums doubles exactly, so the engine never
  needs this; it exists purely so parity tests can reproduce reference
  CSV values bit-for-bit.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame


def write_poly_results(
    df: DataFrame, out_dir: str, end_time: int, eps: int, value_col: str = "agg"
) -> str:
    """Single TSV, reference naming: raster_<endTime>_<eps>.csv."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"raster_{end_time}_{eps}.csv")
    rows = df.orderBy("poly_id").select("poly_id", value_col).collect()
    with open(path, "w") as f:
        for r in rows:
            f.write(f"{r['poly_id']}\t{r[value_col]}\n")
    return path


def write_error_bounds(
    df: DataFrame, out_dir: str, end_time: int, eps: int
) -> str:
    """err_bound_<endTime>_<eps>.csv: poly, lo, hi, lo1, hi1."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"err_bound_{end_time}_{eps}.csv")
    rows = df.orderBy("poly_id").collect()
    with open(path, "w") as f:
        for r in rows:
            f.write(f"{r['poly_id']}\t{r['lo']}\t{r['hi']}\t{r['lo1']}\t{r['hi1']}\n")
    return path


def encode_sum_hi_lo(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-value int split (points.vert:150-155): hi = int(v)//100,
    lo = (v - 100*hi)*10 accumulated as ints."""
    v = np.asarray(values, dtype=np.float64)
    hi = (v.astype(np.int64)) // 100
    lo = np.rint((v - 100.0 * hi.astype(np.float64)) * 10.0).astype(np.int64)
    return hi, lo


def decode_avg_hi_lo(hi_sum: int, lo_sum: int, count: int) -> float:
    """main.cpp:203-223: avg = (hi*100 + lo/10) / count."""
    if count == 0:
        return float("nan")
    return (hi_sum * 100.0 + lo_sum / 10.0) / count
