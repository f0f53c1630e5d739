"""Multimodal plumbing: schema/batch/fan-out contracts around the
stubbed codec kernels."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hdp2_5_hive_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return mm.attach_binary_payload(docs.limit(50), "text", "doc_id")


def test_metadata_struct(media):
    r = media.first()
    assert r.meta.n_bytes == len(r.payload)
    assert len(r.meta.sha) == 64


def test_features_deterministic(media):
    f1 = {r.media_id: r.feature for r in mm.extract_features(media).collect()}
    f2 = {r.media_id: r.feature for r in mm.extract_features(media).collect()}
    assert f1 == f2
    assert all(len(v) == 8 for v in f1.values())


def test_resize_contract(media):
    out = mm.resize_images(media, 16, 8).collect()
    assert all(len(r.payload) == 16 * 8 for r in out)
    assert all(r.width == 16 and r.height == 8 for r in out)
    assert len(out) == media.count()


def test_frame_sampling_fanout(media):
    frames = mm.sample_frames(media, n_frames=4)
    counts = (
        frames.groupBy("media_id").count().select("count").distinct().collect()
    )
    assert [r["count"] for r in counts] == [4]
    # frames cover distinct byte ranges, in order
    one = (
        frames.filter(F.col("media_id") == frames.first().media_id)
        .orderBy("frame_idx")
        .collect()
    )
    assert [r.frame_idx for r in one] == [0, 1, 2, 3]


def test_decode_stub_raises_on_none():
    with pytest.raises(NotImplementedError):
        mm.decode_image_stub(None)
