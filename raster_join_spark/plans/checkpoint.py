"""Resumable execution with per-partition checkpoints, lineage + metrics.

The reference simply re-runs a failed query; at 10^12 documents a
spatial-aggregation job over an entire table is hours of work, so the
north_rule requires resumability. Model:

- a job is a list of UNITS (one per tile-store partition, i.e. one
  ``(cell_bucket, tbucket)`` directory — the driver's unit of retry)
- each unit runs the query on just its partition slice and writes a
  partial-result parquet under ``<ckpt>/parts/unit=<id>/`` atomically
  (write to _tmp, rename)
- LINEAGE table (parquet): one row per completed unit — unit id, input
  partition, input rows, output rows, wall ms, injected timestamp,
  snapshot id. Written append-only, one file per unit.
- METRICS table: per-unit timings + engine counters.
- resume: a re-run enumerates lineage, skips completed units, finishes
  the rest; the final aggregate is a union of the partial parquets —
  deterministic regardless of which run produced which unit.

The partial results are ADDITIVE (per-polygon partial vectors), so the
final combine is a groupBy-sum — the same partial/final contract the
fused join path already uses.
"""

from __future__ import annotations

import glob
import os
import shutil
import time
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from raster_join_spark.sources.tiles import TileStore


def _write_parquet(pdf, path: str) -> None:
    """Driver-side parquet write (atomic at the caller's rename level) —
    Spark-readable, used for the tiny per-unit partial/lineage/metrics
    files so bookkeeping never costs a Spark job barrier."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)


@dataclass
class CheckpointedJob:
    """``unit_fn`` MUST return an ADDITIVE PARTIAL — a small aggregate
    (<= a few thousand rows, e.g. one row per polygon), because each
    unit's partial is collected onto the driver before the atomic-rename
    write. A unit_fn that emits per-point rows would flood the driver;
    ``max_unit_rows`` enforces the contract (fail fast instead of OOM)."""

    spark: SparkSession
    store: TileStore
    ckpt_dir: str
    job_id: str = "job"
    max_unit_rows: int = 1_000_000

    # ---------------------------------------------------------- plumbing

    def _unit_dir(self, unit: str, final: bool = True) -> str:
        leaf = f"unit={unit}" if final else f"_tmp_unit={unit}"
        return os.path.join(self.ckpt_dir, "parts", leaf)

    def _lineage_dir(self) -> str:
        return os.path.join(self.ckpt_dir, "lineage")

    def _metrics_dir(self) -> str:
        return os.path.join(self.ckpt_dir, "metrics")

    def completed_units(self) -> set[str]:
        d = self._lineage_dir()
        # glob, not isdir: a crash between makedirs and the first unit's
        # lineage write leaves an empty directory, and read.parquet on
        # zero files raises instead of meaning "nothing completed"
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            return set()
        df = self.spark.read.parquet(d)
        return {r["unit"] for r in df.select("unit").distinct().collect()}

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(self._lineage_dir())

    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(self._metrics_dir())

    # --------------------------------------------------------------- run

    def run(
        self,
        unit_fn: Callable[[DataFrame], DataFrame],
        ts_now: float | None = None,
        fail_after_units: int | None = None,
    ) -> DataFrame:
        """Execute ``unit_fn`` (partition slice -> additive partial DF) for
        every pending unit, then combine all partials.

        ``fail_after_units`` injects a crash after N fresh units (test
        hook for the kill/resume scenario). ``ts_now`` is the injected
        lineage timestamp (determinism; no wall-clock in outputs).
        """
        manifest = self.store.current_manifest()
        assert manifest is not None, "tile store has no snapshot"
        snap = int(manifest["snapshot_id"])
        # unit names are SNAPSHOT-SCOPED: a re-written store is new
        # input, so partials computed against an older snapshot must
        # neither satisfy the done-check nor be unioned into the result
        # (they'd silently mix two versions of the data); lineage keeps
        # the old rows as history, result() reads only this snapshot's
        # unit dirs
        units = {
            f"s{snap}_{p['cell_bucket']}_{p['tbucket']}": p
            for p in manifest["partitions"]
        }
        done = self.completed_units()
        fresh = 0
        for unit, part in sorted(units.items()):
            if unit in done:
                continue
            if fail_after_units is not None and fresh >= fail_after_units:
                raise RuntimeError(f"injected failure after {fresh} units")
            self._run_unit(unit, part, unit_fn, snap, ts_now)
            fresh += 1
        return self.result()

    def _run_unit(
        self,
        unit: str,
        part: dict,
        unit_fn: Callable[[DataFrame], DataFrame],
        snapshot_id: int,
        ts_now: float | None,
    ) -> None:
        t0 = time.perf_counter()
        # the manifest's file list, not the partition DIRECTORY: under
        # snapshot isolation a directory can hold other snapshots' files
        # (pre-overwrite or pre-compaction) that this unit must not see
        slice_df = self.spark.read.option(
            "basePath", os.path.join(self.store.base_dir, "data")
        ).parquet(*self.store._partition_files(part))
        # ONE Spark job per unit: the distributed query runs on the
        # executors, but a unit's PARTIAL is <= n_polys rows by the
        # additive contract, so it lands on the driver (Arrow transfer)
        # and the partial/lineage/metrics parquet files are written
        # driver-side — per-unit cost stays in the query, not in 4 extra
        # job barriers for row-count bookkeeping writes
        pdf = unit_fn(slice_df).limit(self.max_unit_rows + 1).toPandas()
        out_rows = len(pdf)
        if out_rows > self.max_unit_rows:
            raise ValueError(
                f"unit {unit} produced > {self.max_unit_rows} rows — unit_fn "
                "must return an additive PARTIAL (per-group aggregate), not "
                "per-row output; raise max_unit_rows only if the partial is "
                "genuinely that wide"
            )

        tmp = self._unit_dir(unit, final=False)
        dst = self._unit_dir(unit, final=True)
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        _write_parquet(pdf, os.path.join(tmp, "part-0.parquet"))
        if os.path.isdir(dst):
            shutil.rmtree(dst)  # crashed between write and lineage: redo
        os.replace(tmp, dst)
        wall_ms = (time.perf_counter() - t0) * 1000

        ts = ts_now if ts_now is not None else time.time()
        import pandas as pd

        os.makedirs(self._lineage_dir(), exist_ok=True)
        os.makedirs(self._metrics_dir(), exist_ok=True)
        # one file per unit, append-only -> atomic completion marker
        _write_parquet(
            pd.DataFrame(
                {
                    "job_id": [self.job_id],
                    "unit": [unit],
                    "snapshot_id": pd.array([int(snapshot_id)], dtype="int64"),
                    "input_partition": [
                        f"cell_bucket={part['cell_bucket']}/tbucket={part['tbucket']}"
                    ],
                    "rows_in": pd.array([int(part["rows"])], dtype="int64"),
                    "rows_out": pd.array([int(out_rows)], dtype="int64"),
                    "ts": [float(ts)],
                }
            ),
            os.path.join(self._lineage_dir(), f"unit_{unit}.parquet"),
        )
        _write_parquet(
            pd.DataFrame(
                {
                    "job_id": [self.job_id],
                    "unit": [unit],
                    "wall_ms": [float(wall_ms)],
                    "rows_in": pd.array([int(part["rows"])], dtype="int64"),
                    "ts": [float(ts)],
                }
            ),
            os.path.join(self._metrics_dir(), f"unit_{unit}.parquet"),
        )

    def result(self) -> DataFrame:
        """Combine the CURRENT snapshot's unit partials (additive) into
        the final aggregate. Partials from older snapshots stay on disk
        as history but never contribute — mixing them with the current
        snapshot's would double- or mis-count rewritten partitions."""
        manifest = self.store.current_manifest()
        assert manifest is not None, "tile store has no snapshot"
        prefix = f"unit=s{int(manifest['snapshot_id'])}_"
        parts_dir = os.path.join(self.ckpt_dir, "parts")
        unit_dirs = [
            os.path.join(parts_dir, d)
            for d in os.listdir(parts_dir)
            if d.startswith(prefix)
        ]
        df = self.spark.read.parquet(*unit_dirs)
        val_cols = [c for c in df.columns if c != "poly_id"]
        return df.groupBy("poly_id").agg(
            *[F.sum(c).alias(c) for c in val_cols]
        )
