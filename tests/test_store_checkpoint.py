"""Tile store (Iceberg-style layout) + resumable checkpointed execution."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from raster_join_spark.fixtures import COARSE_GRID, ORACLE_POLYS
from raster_join_spark.operators.spatial_join import SpatialJoin
from raster_join_spark.plans.checkpoint import CheckpointedJob
from raster_join_spark.sources.pages import points_df
from raster_join_spark.sources.tiles import TileStore


@pytest.fixture(scope="module")
def pts(spark, sf_dir):
    return points_df(spark, sf_dir)


@pytest.fixture(scope="module")
def store(spark, pts, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("tilestore"))
    st = TileStore(base_dir=base, grid=COARSE_GRID, n_buckets=8, salt=4,
                   salt_threshold=100)
    st.write(pts, ts_now=1700000000.0)
    return st


def test_manifest_written(store):
    m = store.current_manifest()
    assert m["snapshot_id"] == 1 and m["parent_snapshot_id"] is None
    assert sum(p["rows"] for p in m["partitions"]) == 1000
    # hot NYC cluster forces at least one salted partition at threshold 100
    assert len(m["salted_partitions"]) >= 1


def test_roundtrip_and_text_invariant(spark, store, pts):
    back = store.read(spark)
    assert back.count() == 1000
    a = pts.select("url", "x", "y").toPandas().sort_values("url", ignore_index=True)
    b = back.select("url", "x", "y").toPandas().sort_values("url", ignore_index=True)
    assert a.equals(b)


def test_salted_hot_partition_has_multiple_files(store):
    cb, tb = store.current_manifest()["salted_partitions"][0]
    d = os.path.join(store.base_dir, "data", f"cell_bucket={cb}", f"tbucket={tb}")
    files = [f for f in os.listdir(d) if f.endswith(".parquet")]
    assert len(files) >= 2, "salting should split the hot partition"


def test_pruned_read_superset_semantics(spark, store, pts):
    box = (-80_000_000.0, 39_000_000.0, -70_000_000.0, 43_000_000.0)
    df, report = store.pruned_read(spark, box=box)
    assert report["scanned_partitions"] < report["total_partitions"]
    # superset at partition granularity; exact residual filter gives truth
    exact = pts.filter(
        (F.col("x") >= box[0]) & (F.col("x") <= box[2])
        & (F.col("y") >= box[1]) & (F.col("y") <= box[3])
    ).count()
    got_exact = df.filter(
        (F.col("x") >= box[0]) & (F.col("x") <= box[2])
        & (F.col("y") >= box[1]) & (F.col("y") <= box[3])
    ).count()
    assert df.count() >= exact
    assert got_exact == exact


def test_snapshot_lineage_on_rewrite(spark, store, pts):
    m1 = store.current_manifest()
    store.write(pts, ts_now=1700000001.0)
    m2 = store.current_manifest()
    assert m2["snapshot_id"] == m1["snapshot_id"] + 1
    assert m2["parent_snapshot_id"] == m1["snapshot_id"]


def test_checkpoint_resume_after_injected_failure(spark, store, pts, tmp_path):
    ckpt = str(tmp_path / "ckpt")

    def unit_fn(slice_df):
        sj = SpatialJoin(spark, ORACLE_POLYS, COARSE_GRID)
        return sj.hybrid_join(slice_df, include_zero=False)

    job = CheckpointedJob(spark, store, ckpt, job_id="j1")
    with pytest.raises(RuntimeError, match="injected failure"):
        job.run(unit_fn, ts_now=1.0, fail_after_units=2)
    assert len(job.completed_units()) == 2

    # resume: completes the remaining units only
    out = job.run(unit_fn, ts_now=2.0).toPandas().set_index("poly_id")["agg"]

    sj = SpatialJoin(spark, ORACLE_POLYS, COARSE_GRID)
    exp = (
        sj.hybrid_join(pts, include_zero=False)
        .toPandas()
        .set_index("poly_id")["agg"]
    )
    assert out.sort_index().equals(exp.sort_index())

    lin = job.lineage().toPandas()
    n_parts = len(store.current_manifest()["partitions"])
    assert len(lin) == n_parts
    assert set(lin[lin.ts == 1.0].unit) <= set(lin.unit)
    assert (lin.rows_in > 0).all()
    met = job.metrics().toPandas()
    assert len(met) == n_parts and (met.wall_ms > 0).all()

    # idempotent: a third run does nothing new, result identical
    out2 = job.run(unit_fn, ts_now=3.0).toPandas().set_index("poly_id")["agg"]
    assert out2.sort_index().equals(exp.sort_index())
    assert len(job.lineage().toPandas()) == n_parts


def test_append_manifest_describes_whole_table(spark, pts, tmp_path):
    """An append snapshot's manifest must cover ALL on-disk data, not
    just the new batch: pruned_read consults manifest min/max boxes and
    row counts, so a batch-2-only manifest would skip batch-1-only
    partitions entirely and prune shared ones with too-tight boxes."""
    base = str(tmp_path / "store_append")
    st = TileStore(base_dir=base, grid=COARSE_GRID, n_buckets=8, salt=4,
                   salt_threshold=100)
    half_a = pts.filter(F.col("x") < -100_000_000.0)
    half_b = pts.filter(F.col("x") >= -100_000_000.0)
    na, nb = half_a.count(), half_b.count()
    assert na > 0 and nb > 0
    st.write(half_a, ts_now=1700000000.0)
    st.write(half_b, ts_now=1700000001.0, mode="append")
    m = st.current_manifest()
    assert m["snapshot_id"] == 2
    assert sum(p["rows"] for p in m["partitions"]) == na + nb
    # a box that matches ONLY batch-1 (west) points must survive pruning
    box = (-124_500_000.0, 24_000_000.0, -101_000_000.0, 49_000_000.0)
    df, report = st.pruned_read(spark, box=box)
    exact = pts.filter(
        (F.col("x") >= box[0]) & (F.col("x") <= box[2])
        & (F.col("y") >= box[1]) & (F.col("y") <= box[3])
    ).count()
    got = df.filter(
        (F.col("x") >= box[0]) & (F.col("x") <= box[2])
        & (F.col("y") >= box[1]) & (F.col("y") <= box[3])
    ).count()
    assert got == exact and exact > 0
    # full read sees both batches
    assert st.read(spark).count() == na + nb


def test_checkpoint_units_are_snapshot_scoped(spark, pts, tmp_path):
    """Resume after the store is REWRITTEN must not reuse (or union)
    partials computed against the old snapshot — unit names and
    result() are snapshot-scoped."""
    base = str(tmp_path / "store_resnap")
    st = TileStore(base_dir=base, grid=COARSE_GRID, n_buckets=8, salt=4,
                   salt_threshold=100)
    st.write(pts, ts_now=1700000000.0)
    ckpt = str(tmp_path / "ckpt_resnap")

    def unit_fn(slice_df):
        sj = SpatialJoin(spark, ORACLE_POLYS, COARSE_GRID)
        return sj.hybrid_join(slice_df, include_zero=False)

    job = CheckpointedJob(spark, st, ckpt, job_id="j2")
    out1 = job.run(unit_fn, ts_now=1.0).toPandas().set_index("poly_id")["agg"]

    # rewrite the store with HALF the rows: stale partials must not leak
    half = pts.filter(F.col("event_id") % 2 == 0)
    st.write(half, ts_now=1700000002.0)
    out2 = job.run(unit_fn, ts_now=2.0).toPandas().set_index("poly_id")["agg"]

    sj = SpatialJoin(spark, ORACLE_POLYS, COARSE_GRID)
    exp2 = (
        sj.hybrid_join(half, include_zero=False)
        .toPandas()
        .set_index("poly_id")["agg"]
    )
    assert out2.sort_index().equals(exp2.sort_index())
    assert out2.sum() < out1.sum()  # really recomputed, not served stale


def test_checkpoint_empty_lineage_dir_resumes(spark, pts, tmp_path):
    """A crash between makedirs(lineage) and the first lineage write
    leaves an empty dir; completed_units must treat it as 'nothing
    done', not raise on parquet schema inference."""
    base = str(tmp_path / "store_emptylin")
    st = TileStore(base_dir=base, grid=COARSE_GRID, n_buckets=8, salt=4,
                   salt_threshold=100)
    st.write(pts, ts_now=1700000000.0)
    ckpt = str(tmp_path / "ckpt_emptylin")
    job = CheckpointedJob(spark, st, ckpt, job_id="j3")
    os.makedirs(os.path.join(ckpt, "lineage"))
    assert job.completed_units() == set()

    def unit_fn(slice_df):
        sj = SpatialJoin(spark, ORACLE_POLYS, COARSE_GRID)
        return sj.hybrid_join(slice_df, include_zero=False)

    out = job.run(unit_fn, ts_now=1.0).toPandas().set_index("poly_id")["agg"]
    sj = SpatialJoin(spark, ORACLE_POLYS, COARSE_GRID)
    exp = (
        sj.hybrid_join(pts, include_zero=False).toPandas()
        .set_index("poly_id")["agg"]
    )
    assert out.sort_index().equals(exp.sort_index())


def test_time_travel_and_snapshot_isolation(spark, pts, tmp_path):
    """Writes are FS-appends + manifest commits: a manifest-level
    overwrite must leave older snapshots readable (time travel), and
    every read must see exactly its snapshot's files — never a blend."""
    base = str(tmp_path / "store_tt")
    st = TileStore(base_dir=base, grid=COARSE_GRID, n_buckets=8, salt=4,
                   salt_threshold=100)
    west = pts.filter(F.col("x") < -100_000_000.0)
    east = pts.filter(F.col("x") >= -100_000_000.0)
    nw, ne = west.count(), east.count()
    st.write(west, ts_now=1.0)                     # snapshot 1
    st.write(east, ts_now=2.0, mode="append")      # snapshot 2
    st.write(west, ts_now=3.0)                     # snapshot 3: overwrite
    assert st.read(spark, snapshot_id=1).count() == nw
    assert st.read(spark, snapshot_id=2).count() == nw + ne
    assert st.read(spark, snapshot_id=3).count() == nw
    assert st.read(spark).count() == nw            # current == 3
    # snapshot 1 and 3 hold the same logical rows via DIFFERENT files
    m1, m3 = st.manifest(1), st.manifest(3)
    f1 = {f for p in m1["partitions"] for f in p["files"]}
    f3 = {f for p in m3["partitions"] for f in p["files"]}
    assert f1 and f3 and f1.isdisjoint(f3)
    assert st.snapshot_ids() == [1, 2, 3]


def test_compact_merges_files_and_preserves_history(spark, pts, tmp_path):
    """After N appends a shared partition holds >=N files; compact()
    must cut the referenced file count, keep rows/stats identical, and
    leave pre-compaction snapshots readable."""
    base = str(tmp_path / "store_cmp")
    st = TileStore(base_dir=base, grid=COARSE_GRID, n_buckets=8, salt=4,
                   salt_threshold=10_000)
    thirds = [pts.filter(F.col("event_id") % 3 == i) for i in range(3)]
    st.write(thirds[0], ts_now=1.0)
    st.write(thirds[1], ts_now=2.0, mode="append")
    st.write(thirds[2], ts_now=3.0, mode="append")
    n = pts.count()
    m_before = st.current_manifest()
    files_before = sum(len(p["files"]) for p in m_before["partitions"])
    before = (
        st.read(spark).select("url", "x", "y").toPandas()
        .sort_values("url", ignore_index=True)
    )
    m_after = st.compact(spark, ts_now=4.0)
    assert m_after["operation"] == "compact"
    files_after = sum(len(p["files"]) for p in m_after["partitions"])
    assert files_after < files_before
    # identical logical content, identical manifest stats
    after = (
        st.read(spark).select("url", "x", "y").toPandas()
        .sort_values("url", ignore_index=True)
    )
    assert after.equals(before)
    assert sum(p["rows"] for p in m_after["partitions"]) == n
    for pb, pa in zip(m_before["partitions"], m_after["partitions"]):
        assert (pb["cell_bucket"], pb["tbucket"]) == (pa["cell_bucket"], pa["tbucket"])
        assert pb["rows"] == pa["rows"] and pb["min_x"] == pa["min_x"]
    # pruned reads ride the compacted file list
    box = (-80_000_000.0, 39_000_000.0, -70_000_000.0, 43_000_000.0)
    df, report = st.pruned_read(spark, box=box)
    exact = pts.filter(
        (F.col("x") >= box[0]) & (F.col("x") <= box[2])
        & (F.col("y") >= box[1]) & (F.col("y") <= box[3])
    ).count()
    got = df.filter(
        (F.col("x") >= box[0]) & (F.col("x") <= box[2])
        & (F.col("y") >= box[1]) & (F.col("y") <= box[3])
    ).count()
    assert got == exact
    # time travel across the compaction boundary
    assert st.read(spark, snapshot_id=3).count() == n
    assert st.read(spark, snapshot_id=1).count() == thirds[0].count()


def test_expire_snapshots_gc(spark, pts, tmp_path):
    """expire_snapshots drops old manifests and deletes every data file
    no retained manifest references; the current snapshot keeps working
    and on-disk files match its manifest exactly."""
    base = str(tmp_path / "store_gc")
    st = TileStore(base_dir=base, grid=COARSE_GRID, n_buckets=8, salt=4,
                   salt_threshold=100)
    west = pts.filter(F.col("x") < -100_000_000.0)
    st.write(pts, ts_now=1.0)
    st.write(west, ts_now=2.0)       # overwrite: snapshot 1 now historical
    st.compact(spark, ts_now=3.0)    # snapshot 3 references only new files
    n_live = west.count()
    report = st.expire_snapshots(keep_last=1)
    assert report["removed_snapshots"] == [1, 2]
    assert report["removed_files"] > 0
    assert st.snapshot_ids() == [3]
    cur = st.current_manifest()
    referenced = {f for p in cur["partitions"] for f in p["files"]}
    assert st._list_data_files() == referenced
    assert st.read(spark).count() == n_live
    with pytest.raises(FileNotFoundError):
        st.manifest(1)
    with pytest.raises(FileNotFoundError):
        st.read(spark, snapshot_id=2)


def test_pre_filelist_manifest_append_and_expire(spark, pts, tmp_path):
    """Back-compat with pre-file-list manifests (no "files" keys —
    readable only via the directory fallback): an append must NOT
    claim a files list that covers only the new batch (old rows would
    silently vanish from reads), and expire_snapshots must never GC
    files under a retained fallback partition's directory."""
    import json

    base = str(tmp_path / "store_oldmf")
    st = TileStore(base_dir=base, grid=COARSE_GRID, n_buckets=8, salt=4,
                   salt_threshold=100)
    west = pts.filter(F.col("x") < -100_000_000.0)
    east = pts.filter(F.col("x") >= -100_000_000.0)
    nw, ne = west.count(), east.count()
    st.write(west, ts_now=1.0)
    # doctor snapshot 1 into the pre-file-list format
    mp = st._manifest_path(1)
    m = json.load(open(mp))
    for p in m["partitions"]:
        p.pop("files", None)
    json.dump(m, open(mp, "w"))

    st.write(east, ts_now=2.0, mode="append")
    # shared partitions fell back to directory reads: ALL rows visible
    assert st.read(spark).count() == nw + ne
    box = (-124_500_000.0, 24_000_000.0, -101_000_000.0, 49_000_000.0)
    df, _ = st.pruned_read(spark, box=box)
    exact = pts.filter(
        (F.col("x") >= box[0]) & (F.col("x") <= box[2])
        & (F.col("y") >= box[1]) & (F.col("y") <= box[3])
    ).count()
    got = df.filter(
        (F.col("x") >= box[0]) & (F.col("x") <= box[2])
        & (F.col("y") >= box[1]) & (F.col("y") <= box[3])
    ).count()
    assert got == exact and exact > 0

    # expiry retaining the fallback manifest must not GC its directory
    # (note: a pre-file-list snapshot cannot time travel — its directory
    # fallback sees every file later written into shared partitions;
    # the guarantee is that NO data reachable from a retained manifest
    # is deleted)
    files_before = st._list_data_files()
    report = st.expire_snapshots(keep_last=2)
    assert st._list_data_files() == files_before
    assert report["removed_files"] == 0
    assert st.read(spark).count() == nw + ne
    assert report["removed_snapshots"] == []


def test_empty_batch_commits_typed_empty_snapshot(spark, pts, tmp_path):
    """An empty overwrite genuinely empties the table: the zero-partition
    snapshot reads back as an empty TYPED frame (same columns as a
    file-backed read), and pruned_read stays functional."""
    st = TileStore(base_dir=str(tmp_path / "ts_empty"), grid=COARSE_GRID,
                   n_buckets=8, salt=4, salt_threshold=100)
    st.write(pts, ts_now=1.0)
    full_cols = set(st.read(spark).columns)
    m = st.write(pts.limit(0), ts_now=2.0)  # overwrite with nothing
    assert m["snapshot_id"] == 2 and m["partitions"] == []
    back = st.read(spark)
    assert back.count() == 0
    assert set(back.columns) == full_cols
    df, report = st.pruned_read(spark, box=(0.0, 0.0, 1.0, 1.0))
    assert df.count() == 0 and report["scanned_partitions"] == 0
    # time travel to snapshot 1 still sees the data (snapshot isolation)
    assert st.read(spark, snapshot_id=1).count() == 1000


def test_first_write_empty_then_append(spark, pts, tmp_path):
    st = TileStore(base_dir=str(tmp_path / "ts_empty0"), grid=COARSE_GRID,
                   n_buckets=8, salt=4, salt_threshold=100)
    st.write(pts.limit(0), ts_now=1.0)
    assert st.read(spark).count() == 0
    st.write(pts, mode="append", ts_now=2.0)
    assert st.read(spark).count() == 1000


def test_concurrent_commit_one_wins_one_raises(spark, pts, tmp_path):
    """Two writers racing on the same parent snapshot: the CAS on the
    snapshot manifest file lets exactly one commit; the loser raises
    ConcurrentCommitError instead of silently clobbering current."""
    from raster_join_spark.sources.tiles import ConcurrentCommitError

    base = str(tmp_path / "ts_race")
    w1 = TileStore(base_dir=base, grid=COARSE_GRID, n_buckets=8, salt=4,
                   salt_threshold=100)
    w2 = TileStore(base_dir=base, grid=COARSE_GRID, n_buckets=8, salt=4,
                   salt_threshold=100)
    w1.write(pts, ts_now=1.0)
    # simulate the race: both writers observed parent snapshot 1; w1
    # commits snapshot 2 first, then w2 tries to commit against the
    # same (stale) parent it captured before w1's commit
    prev = w2.current_manifest()
    w1.write(pts, mode="append", ts_now=2.0)
    with pytest.raises(ConcurrentCommitError):
        w2._commit_manifest(prev, {}, set(), ts_now=2.5, operation="append")
    # the winner's commit is intact
    assert w1.current_manifest()["snapshot_id"] == 2
    assert w1.read(spark).count() == 2000


def test_orphan_manifest_heals_and_commits(spark, pts, tmp_path):
    """A writer that crashes after durably creating snap-N+1 but BEFORE
    advancing metadata/current must not wedge the table forever
    (ADVICE r6): manifest files are created complete via tmp+hardlink,
    so their existence IS the commit point — readers roll the stale
    pointer forward and the next commit builds on the orphan instead of
    colliding with it on every retry."""
    base = str(tmp_path / "ts_orphan")
    st = TileStore(base_dir=base, grid=COARSE_GRID, n_buckets=8, salt=4,
                   salt_threshold=100)
    st.write(pts, ts_now=1.0)
    st.write(pts, mode="append", ts_now=2.0)  # snapshot 2, fully committed
    cur = os.path.join(base, "metadata", "current")
    with open(cur, "w") as f:  # simulate the crash: pointer never advanced
        f.write("1")
    # reader heals the pointer onto the committed orphan
    assert st.current_manifest()["snapshot_id"] == 2
    with open(cur) as f:
        assert f.read().strip() == "2"
    # and the next append commits snapshot 3 (no phantom collision)
    st.write(pts, mode="append", ts_now=3.0)
    m = st.current_manifest()
    assert m["snapshot_id"] == 3 and m["parent_snapshot_id"] == 2
    assert st.read(spark).count() == 3000
    # no tmp litter left behind by the link-based CAS
    litter = [f for f in os.listdir(os.path.join(base, "metadata"))
              if ".tmp." in f]
    assert litter == []
