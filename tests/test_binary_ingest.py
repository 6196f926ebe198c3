"""Fixed-width binary record ingest (S1 parity adapter) — layout parity,
split planning, and distributed round-trip (Dataset.cpp:13-57,
TaxiRecord.hpp:15-46, TwitterRecord.hpp:19-28)."""

from __future__ import annotations

import os

import numpy as np

from raster_join_spark.sources.binary import (
    TAXI_LAYOUT,
    TWITTER_LAYOUT,
    plan_splits,
    read_binary_records,
    write_binary_records,
)


def test_record_sizes_match_reference():
    assert TAXI_LAYOUT.record_size == 88  # TaxiRecord.hpp "size = 88"
    assert TWITTER_LAYOUT.record_size == 32  # TwitterRecord.hpp "size = 32"


def test_split_planning_ignores_trailing_partial(tmp_path):
    p = tmp_path / "t.bin"
    # 5 whole records + 7 stray bytes: count = size // record_size
    p.write_bytes(b"\0" * (5 * 32 + 7))
    splits = plan_splits([str(p)], 32, split_records=2)
    assert splits == [(str(p), 0, 2), (str(p), 2, 2), (str(p), 4, 1)]


def test_taxi_roundtrip_multisplit(spark, tmp_path):
    n = 5000
    rng = np.random.RandomState(5)
    cols = {
        "db_idx": np.arange(n, dtype=np.int64),
        "pick_x": rng.uniform(-124e6, -67e6, n).round(),
        "pick_y": rng.uniform(24e6, 48e6, n).round(),
        "pickup_time": rng.randint(0, 2**31, n),
        "vendor": np.array(["VTS_", "CMT_"] * (n // 2)),
        "fare": rng.randint(0, 65536, n),
        "passengers": rng.randint(0, 256, n),
        "miles": rng.uniform(0, 50, n).astype(np.float32),
        "store_and_forward": rng.randint(0, 2, n).astype(bool),
    }
    path = str(tmp_path / "taxi.bin")
    assert write_binary_records(path, TAXI_LAYOUT, cols) == n
    assert os.path.getsize(path) == n * 88
    out = read_binary_records(
        spark,
        path,
        TAXI_LAYOUT,
        fields=["db_idx", "pick_x", "pick_y", "vendor", "fare", "miles",
                "store_and_forward"],
        split_records=512,  # forces 10 splits
    ).toPandas().sort_values("db_idx", ignore_index=True)
    assert len(out) == n
    np.testing.assert_array_equal(out["pick_x"].to_numpy(), cols["pick_x"])
    np.testing.assert_array_equal(out["pick_y"].to_numpy(), cols["pick_y"])
    np.testing.assert_array_equal(out["fare"].to_numpy(), cols["fare"])
    np.testing.assert_array_equal(
        out["miles"].to_numpy(np.float32).view(np.uint32),
        cols["miles"].view(np.uint32),
    )
    np.testing.assert_array_equal(
        out["store_and_forward"].to_numpy(), cols["store_and_forward"]
    )
    assert set(out["vendor"].unique()) == {"VTS_", "CMT_"}


def test_twitter_roundtrip_directory(spark, tmp_path):
    """Directory of several files — the multi-file scan shape."""
    total = 0
    for i in range(3):
        n = 100 + i
        write_binary_records(
            str(tmp_path / f"part{i}.bin"),
            TWITTER_LAYOUT,
            {
                "user_id": np.arange(total, total + n, dtype=np.int64),
                "time": np.full(n, 1_700_000_000 + i),
                "loc_x": np.full(n, -74.0, np.float32),
                "loc_y": np.full(n, 40.7, np.float32),
                "fav_ct": np.arange(n, dtype=np.int32),
                "rt_ct": np.zeros(n, np.int32),
            },
        )
        total += n
    out = read_binary_records(spark, str(tmp_path), TWITTER_LAYOUT).toPandas()
    assert len(out) == total
    assert sorted(out["user_id"]) == list(range(total))
    assert out["loc_x"].to_numpy(np.float32)[0] == np.float32(-74.0)


def test_u4_fields_do_not_wrap_negative(spark, tmp_path):
    """ADVICE round 4: taxi `duration` is <u4 — values >= 2^31 that the
    format legitimately supports must widen to LongType, not wrap
    negative through int32."""
    n = 16
    big = np.array([2**31, 2**32 - 1, 2**31 + 7, 0] * (n // 4), dtype=np.uint32)
    path = str(tmp_path / "taxi_u4.bin")
    write_binary_records(
        path,
        TAXI_LAYOUT,
        {"db_idx": np.arange(n, dtype=np.int64), "duration": big},
    )
    df = read_binary_records(spark, path, TAXI_LAYOUT, fields=["db_idx", "duration"])
    assert dict(df.dtypes)["duration"] == "bigint"
    out = df.toPandas().sort_values("db_idx", ignore_index=True)
    np.testing.assert_array_equal(out["duration"].to_numpy(np.uint64), big)


def test_directory_scan_skips_subdirs_and_partials(spark, tmp_path):
    """ADVICE round 4: a subdirectory (or any non-file entry) inside the
    data directory must be skipped, not treated as a record file."""
    n = 50
    write_binary_records(
        str(tmp_path / "part0.bin"),
        TWITTER_LAYOUT,
        {
            "user_id": np.arange(n, dtype=np.int64),
            "time": np.full(n, 1_700_000_000),
            "loc_x": np.full(n, -74.0, np.float32),
            "loc_y": np.full(n, 40.7, np.float32),
            "fav_ct": np.zeros(n, np.int32),
            "rt_ct": np.zeros(n, np.int32),
        },
    )
    (tmp_path / "nested_dir").mkdir()  # would raise in getsize/fromfile
    out = read_binary_records(spark, str(tmp_path), TWITTER_LAYOUT).toPandas()
    assert len(out) == n


def test_unknown_field_rejected(spark, tmp_path):
    import pytest

    p = tmp_path / "x.bin"
    p.write_bytes(b"\0" * 32)
    with pytest.raises(KeyError):
        read_binary_records(spark, str(p), TWITTER_LAYOUT, fields=["nope"])
