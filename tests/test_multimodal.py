"""Multimodal plumbing tests: schema, batch shape, determinism of the
fake-container decode path, and the gated real-codec stub."""

import numpy as np
import pytest

from marc_solr_profiling_spark.operators.multimodal import (
    MEDIA_SCHEMA, decode_real, media_features, pack_media, sample_frames,
    resize_images, synthetic_media, _parse_header,
)


def test_pack_parse_roundtrip():
    body = bytes(range(48))
    p = pack_media(7, 2, 4, 4, 3, body)
    mod, w, h, nf, got = _parse_header(p)
    assert (mod, w, h, nf) == (2, 4, 4, 3)
    assert got == body


def test_parse_rejects_garbage():
    assert _parse_header(None) is None
    assert _parse_header(b"notmagic") is None


def test_decode_real_is_gated():
    with pytest.raises(NotImplementedError):
        decode_real(b"anything")


def test_synthetic_media_schema_and_determinism(spark):
    m1 = synthetic_media(spark, 30).orderBy("media_id").collect()
    m2 = synthetic_media(spark, 30).orderBy("media_id").collect()
    assert [r["payload"] for r in m1] == [r["payload"] for r in m2]
    assert synthetic_media(spark, 5).schema == MEDIA_SCHEMA
    mods = {r["modality"] for r in m1}
    assert mods == {"image", "audio", "video"}


def test_media_features(spark):
    media = synthetic_media(spark, 30)
    feats = media_features(media).orderBy("media_id").collect()
    assert len(feats) == 30
    for r in feats:
        assert r["width"] >= 8 and r["height"] >= 8
        assert 0.0 <= r["mean_byte"] <= 255.0
        assert len(r["payload_md5"]) == 32
    # feature values must agree with a local decode of the same payload
    row = media.filter("media_id = 3").first()
    _, w, h, nf, body = _parse_header(row["payload"])
    f3 = [r for r in feats if r["media_id"] == 3][0]
    assert (f3["width"], f3["height"], f3["n_frames"]) == (w, h, nf)
    assert abs(f3["mean_byte"] - np.frombuffer(body, np.uint8).mean()) < 1e-9


def test_sample_frames(spark):
    media = synthetic_media(spark, 30)
    frames = sample_frames(media, every=2).collect()
    vids = {r["media_id"]: r for r in media.filter("modality='video'").collect()}
    assert frames and all(f["media_id"] in vids for f in frames)
    for f in frames:
        meta = vids[f["media_id"]]["meta"]
        assert f["frame_idx"] % 2 == 0 and f["frame_idx"] < meta["n_frames"]
        assert len(f["frame_bytes"]) == meta["width"] * meta["height"]


def test_resize_images(spark):
    media = synthetic_media(spark, 30)
    out = resize_images(media, 16, 16).collect()
    n_images = media.filter("modality='image'").count()
    assert len(out) == n_images
    for r in out:
        mod, w, h, nf, body = _parse_header(r["payload"])
        assert (w, h, nf) == (16, 16, 1)
        assert len(body) == 256
