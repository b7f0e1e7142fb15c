"""Multimodal plumbing: binary payload metadata via mapInPandas, frame plan."""

import hashlib

import pytest

from ecokg_spark.operators.multimodal import (
    decode_image_real,
    decode_image_stub,
    extract_media_meta,
    frame_sample_plan,
    synth_media,
)


def test_media_meta(spark):
    media = synth_media(spark, 30)
    meta = extract_media_meta(media)
    rows = {r["media_id"]: r for r in meta.collect()}
    assert len(rows) == 30
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for mid, p in payloads.items():
        assert rows[mid]["byte_len"] == len(p)
        assert rows[mid]["sha256"] == hashlib.sha256(p).hexdigest()
        w, h, c = decode_image_stub(p)
        assert (rows[mid]["width"], rows[mid]["height"], rows[mid]["n_channels"]) == (w, h, c)


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"xx")


def test_frame_sample_plan(spark):
    media = synth_media(spark, 10)
    plan = frame_sample_plan(media, every_n=10)
    rows = plan.groupBy("media_id").count().collect()
    n_frames = {r["media_id"]: r["n_frames"] for r in media.collect()}
    for r in rows:
        expected = len(range(0, max(n_frames[r["media_id"]] - 1, 0) + 1, 10))
        assert r["count"] == expected
