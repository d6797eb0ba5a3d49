"""Multimodal plumbing tests: stub gating, schemas, Arrow batch behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_streaming_twitter_spark.multimodal import columns as mm

SF = "/root/testdata/sf0.001"


def test_media_table_schema_and_kinds(spark):
    media = mm.media_table(spark, SF)
    assert dict(media.dtypes)["payload"] == "binary"
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_raises_without_codec_unless_fake(spark):
    media = mm.media_table(spark, SF).limit(4)
    if mm._HAVE_PIL:  # pragma: no cover - codec not in this container
        pytest.skip("real codec present")
    with pytest.raises(NotImplementedError):
        mm.decode_media(media)
    rows = mm.decode_media(media, allow_fake=True).collect()
    assert len(rows) == 4
    for r in rows:
        assert r.width >= 64 and r.height >= 48 and r.n_bytes > 0


def test_byte_histogram_fracs_sum_to_one(spark):
    media = mm.media_table(spark, SF).limit(10)
    sums = (
        mm.byte_histograms(media)
        .groupBy("media_id")
        .agg(F.sum("frac").alias("s"))
        .collect()
    )
    assert len(sums) == 10
    for r in sums:
        assert abs(r.s - 1.0) < 1e-9


def test_frame_sampling_stride_and_offsets(spark):
    media = mm.media_table(spark, SF).where(F.col("kind") == "video").limit(3)
    frames = mm.sample_frames(media).collect()
    assert frames
    by_media: dict[int, list[int]] = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r.frame_idx)
    for idxs in by_media.values():
        assert idxs == sorted(idxs)
        assert all(i % mm.FRAME_STRIDE == 0 for i in idxs)
    assert all(r.frame_bytes >= 0 for r in frames)
