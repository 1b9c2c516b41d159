"""Multimodal plumbing: schema, mapInPandas batch shape, deterministic fake
decode, frame-sampling plan, metadata-only stats."""

import pytest
from pyspark.sql import functions as F

from etl_processes_spark.ops.multimodal import (
    FEATURE_DIM,
    extract_features,
    frame_sample_plan,
    make_fake_media_df,
    media_stats,
)


@pytest.fixture(scope="module")
def media(spark):
    return make_fake_media_df(spark, n=24).persist()


def test_extract_features_shape_and_determinism(media):
    a = extract_features(media).orderBy("media_id").collect()
    b = extract_features(media).orderBy("media_id").collect()
    assert len(a) == 24
    for r in a:
        assert len(r["features"]) == FEATURE_DIM
        assert r["n_bytes"] > 0
    assert [r["features"] for r in a] == [r["features"] for r in b]


def test_real_decoder_is_stubbed(media):
    import pyspark.errors

    with pytest.raises(Exception) as exc_info:
        extract_features(media, fake_decode=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or "real image decode" in str(
        exc_info.value
    )


def test_frame_sample_plan(media):
    plan = frame_sample_plan(media, every_ms=1000)
    rows = plan.collect()
    assert all(r["frame_ts_ms"] % 1000 == 0 for r in rows)
    n_videos = media.filter("kind = 'video'").count()
    assert plan.select("media_id").distinct().count() == n_videos


def test_media_stats_by_kind(media):
    stats = {r["kind"]: r for r in media_stats(media).collect()}
    assert set(stats) == {"image", "audio", "video"}
    assert stats["image"]["avg_duration_ms"] is None
    assert stats["video"]["total_bytes"] > 0


def test_kernel_contract_and_swap(media):
    """The decode kernel is pluggable: extract_features(kernel=...) must use
    the supplied callable unchanged — (bytes|None) -> ndarray(dim,) — and
    the fake kernel must itself satisfy the contract."""
    import numpy as np

    from etl_processes_spark.ops.multimodal import _fake_features

    # contract holds for the shipped fake kernel
    v = _fake_features(b"abc", 16)
    assert isinstance(v, np.ndarray) and v.shape == (16,) and v.dtype == np.float64
    assert np.array_equal(v, _fake_features(b"abc", 16))  # deterministic
    assert _fake_features(None, 16).shape == (16,)        # None-safe

    # a swapped-in kernel drives the same plumbing (closure → cloudpickle)
    def ramp_kernel(content):
        if content is None:
            return np.zeros(4)
        return np.arange(4, dtype=np.float64) + float(len(content))

    rows = extract_features(media, dim=4, kernel=ramp_kernel).orderBy("media_id").collect()
    for r in rows:
        assert r["features"] == [float(r["n_bytes"]) + i for i in range(4)]
