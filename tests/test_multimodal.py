"""Multimodal plumbing: schemas, determinism, batch shapes (codecs are
deterministic fakes by design — see operators/multimodal.py)."""

from __future__ import annotations

import struct

from distributed_spatial_index_spark.operators import multimodal as mm


def test_synthetic_media_schema_and_determinism(spark):
    m1 = mm.synthetic_media(spark, n=30).collect()
    m2 = mm.synthetic_media(spark, n=30).collect()
    assert {r["media_type"] for r in m1} == {"image", "audio", "video"}
    by_id1 = {r["media_id"]: bytes(r["blob"]) for r in m1}
    by_id2 = {r["media_id"]: bytes(r["blob"]) for r in m2}
    assert by_id1 == by_id2  # pure function of media_id
    for r in m1:
        w, h = struct.unpack("<II", bytes(r["blob"][:8]))
        assert (w, h) == (r["width"], r["height"])


def test_decode_features(spark):
    media = mm.synthetic_media(spark, n=30)
    feats = mm.decode_features(media).collect()
    assert len(feats) == 30
    for r in feats:
        assert 0 <= r["mean"] <= 255
        assert len(r["histo4"]) == 4
        assert abs(sum(r["histo4"]) - 1.0) < 1e-9


def test_resize(spark):
    media = mm.synthetic_media(spark, n=12)
    small = mm.resize_media(media, 4, 4).collect()
    for r in small:
        w, h = struct.unpack("<II", bytes(r["blob"][:8]))
        assert (w, h) == (4, 4)
        assert len(bytes(r["blob"])) == 8 + 16


def test_sample_frames(spark):
    media = mm.synthetic_media(spark, n=30, n_frames=4)
    frames = mm.sample_frames(media, every_nth=2).collect()
    vids = {r["media_id"] for r in frames}
    assert all(m % 3 == 2 for m in vids)  # only video rows
    per = {}
    for r in frames:
        per.setdefault(r["media_id"], []).append(r["frame_no"])
    for fnos in per.values():
        assert sorted(fnos) == [0, 2]

def test_corrupt_blobs_dropped_not_crashed(spark):
    """Real-pipeline policy: a corrupt media object (short header, zero
    dims, truncated payload, NULL) is dropped from every decoder's output;
    valid rows in the same batch still process."""
    import struct

    import numpy as np

    from distributed_spatial_index_spark.operators.multimodal import (
        decode_features,
        resize_media,
        sample_frames,
    )

    good_payload = np.arange(64, dtype=np.uint8).tobytes()
    rows = [
        (1, "image", struct.pack("<II", 8, 8) + good_payload),      # valid
        (2, "image", b"\x01\x02"),                                  # short header
        (3, "image", struct.pack("<II", 0, 8) + good_payload),      # zero dim
        (4, "image", struct.pack("<II", 8, 8) + good_payload[:10]),  # truncated
        (5, "image", None),                                          # null
        (6, "video", struct.pack("<II", 4, 4) + bytes(range(64))),   # valid, 4 frames
    ]
    media = spark.createDataFrame(
        rows, "media_id long, media_type string, blob binary"
    )
    dec = decode_features(media).collect()
    assert sorted(r["media_id"] for r in dec) == [1, 6]
    rez = resize_media(media, 4, 4).collect()
    assert sorted(r["media_id"] for r in rez) == [1, 6]
    frames = sample_frames(media, every_nth=2).collect()
    assert sorted({r["media_id"] for r in frames}) == [6]
    assert sorted(r["frame_no"] for r in frames) == [0, 2]
