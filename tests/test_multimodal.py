"""Multimodal plumbing: binary payload columns through Arrow stages with
the deterministic FakeCodec (real codecs are deployment plug-ins)."""

from __future__ import annotations

import numpy as np
import pytest

from raster_join_spark.operators.multimodal import (
    Codec,
    FakeCodec,
    attach_media_meta,
    extract_features,
    frame_sample,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [(f"u{i}", bytes([i % 256]) * (100 + i * 7)) for i in range(50)]
    return spark.createDataFrame(rows, "url string, html binary")


def test_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        Codec().decode(b"x")


def test_media_meta_schema_and_determinism(spark, media_df):
    out = attach_media_meta(media_df).select("url", "media_meta.*").toPandas()
    assert list(out.columns) == ["url", "mime", "width", "height", "n_frames"]
    assert (out.mime == "image/fake").all()
    c = FakeCodec()
    expected_w = {f"u{i}": 16 + (100 + i * 7) % 17 for i in range(50)}
    for _, r in out.iterrows():
        assert r.width == expected_w[r.url]


def test_meta_batch_vectorized_matches_per_row_spec():
    """FakeCodec's vectorized meta_batch must agree exactly with the
    per-row Codec.meta fallback (same values, nulls stay null)."""
    import pandas as pd

    payloads = pd.Series(
        [b"x" * (100 + i * 7) for i in range(20)] + [None, b"", b"y" * 3]
    )
    got = FakeCodec().meta_batch(payloads)
    ref = Codec.meta_batch(FakeCodec(), payloads)  # the per-row fallback
    for col in ["mime", "width", "height", "n_frames"]:
        g = got[col].tolist()
        r = ref[col].tolist()
        assert all(
            (pd.isna(a) and pd.isna(b)) or a == b for a, b in zip(g, r)
        ), col


def test_attach_media_meta_null_payload(spark):
    df = spark.createDataFrame(
        [("u0", b"abc"), ("u1", None)], "url string, html binary"
    )
    out = (
        attach_media_meta(df)
        .select("url", "media_meta.*")
        .toPandas()
        .sort_values("url", ignore_index=True)
    )
    assert out.loc[0, "mime"] == "image/fake"
    import pandas as pd

    assert pd.isna(out.loc[1, "width"]) and pd.isna(out.loc[1, "mime"])


def test_extract_features_shapes(spark, media_df):
    out = extract_features(media_df, n_features=8).toPandas()
    assert len(out) == 50
    assert all(len(f) == 8 for f in out.features)
    # deterministic across runs
    out2 = extract_features(media_df, n_features=8).toPandas()
    a = out.sort_values("url", ignore_index=True)
    b = out2.sort_values("url", ignore_index=True)
    for fa, fb in zip(a.features, b.features):
        np.testing.assert_array_equal(np.array(fa), np.array(fb))


def test_frame_sample_one_to_n(spark, media_df):
    frames = frame_sample(media_df, every_n=1).toPandas()
    assert len(frames) == 50  # FakeCodec is single-frame
    assert (frames.frame_idx == 0).all()
    assert all(isinstance(b, (bytes, bytearray)) for b in frames.frame_bytes)


def test_resize_media(spark, media_df):
    from raster_join_spark.operators.multimodal import resize_media

    out = resize_media(media_df, out_w=8, out_h=8).toPandas()
    assert len(out) == 50
    assert (out.thumb_w == 8).all() and (out.thumb_h == 8).all()
    assert all(len(t) == 64 for t in out.thumb)


def test_payload_chunks_budget():
    """Chunking bounds summed payload bytes per chunk (>=1 row each)."""
    import pandas as pd

    from raster_join_spark.operators.multimodal import _payload_chunks

    pdf = pd.DataFrame(
        {"url": [f"u{i}" for i in range(6)],
         "html": [b"x" * n for n in (100, 100, 300, 50, 500, 10)]}
    )
    chunks = list(_payload_chunks(pdf, "html", budget_bytes=300))
    # every chunk within budget unless it is a single oversized row
    for c in chunks:
        total = int(c["html"].map(len).sum())
        assert total <= 300 or len(c) == 1
    # nothing lost, order preserved
    assert [u for c in chunks for u in c["url"]] == [f"u{i}" for i in range(6)]
    assert len(chunks) >= 3
