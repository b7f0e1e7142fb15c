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


def test_real_decode_rejects_unknown_containers():
    with pytest.raises(ValueError):
        decode_image_real(b"xx")


def test_frame_sample_plan(spark):
    media = synth_media(spark, 10)
    plan = frame_sample_plan(media, every_n=10)
    rows = plan.groupBy("media_id").count().collect()
    n_frames = {r["media_id"]: r["n_frames"] for r in media.collect()}
    for r in rows:
        expected = len(range(0, max(n_frames[r["media_id"]] - 1, 0) + 1, 10))
        assert r["count"] == expected


def test_decode_image_real_headers():
    """Stdlib header parser: PNG IHDR (incl. non-RGB color types), GIF
    logical screen, JPEG SOF0 + progressive SOF2 behind APP segments;
    junk falls back to the deterministic stub via decode_dims."""
    import struct

    from ecokg_spark.operators.multimodal import (
        decode_dims,
        decode_image_real,
        decode_image_stub,
        synth_image_payload,
    )

    # synth payloads round-trip their planted dims
    for i in (0, 1, 2, 33, 64, 127):
        w, h, ch = decode_image_real(synth_image_payload(i))
        k = i % 3
        if k == 0:
            assert (w, h, ch) == (i % 64 + 1, (i * 7) % 64 + 1, 3)
        elif k == 1:
            assert (w, h, ch) == (i % 64 + 5, i % 32 + 2, 3)
        else:
            assert (w, h, ch) == ((i * 3) % 64 + 1, i % 64 + 9, 3)

    # grayscale PNG -> 1 channel; RGBA -> 4
    def png(w, h, color_type):
        ihdr = struct.pack(">II", w, h) + bytes([8, color_type, 0, 0, 0])
        return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
                + ihdr + b"\x00" * 4)

    assert decode_image_real(png(640, 480, 0)) == (640, 480, 1)
    assert decode_image_real(png(10, 20, 6)) == (10, 20, 4)

    # progressive JPEG (SOF2) with a leading APP1 segment
    app1 = b"\xff\xe1" + struct.pack(">H", 8) + b"Exif\x00\x00"
    sof2 = (b"\xff\xc2" + struct.pack(">H", 11) + bytes([8])
            + struct.pack(">HH", 300, 200) + bytes([1]) + b"\x00" * 3)
    assert decode_image_real(b"\xff\xd8" + app1 + sof2) == (200, 300, 1)

    # junk -> ValueError from the parser, stub via decode_dims
    import pytest as _pytest
    with _pytest.raises(ValueError):
        decode_image_real(b"not an image")
    assert decode_dims(b"not an image") == decode_image_stub(b"not an image")
    assert decode_dims(b"") == (0, 0, 0)
    # truncated PNG signature -> stub, not crash
    assert decode_dims(b"\x89PNG\r\n\x1a\n\x00\x00") == decode_image_stub(
        b"\x89PNG\r\n\x1a\n\x00\x00")
