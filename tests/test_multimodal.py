"""Multimodal tests: schema, batch shape, determinism of the container
decode path, real pure-numpy codecs (PPM/BMP/WAV), and the PIL gate for
compressed formats."""

import struct

import numpy as np
import pytest

from marc_solr_profiling_spark.operators.multimodal import (
    MEDIA_SCHEMA, decode_bmp, decode_media, decode_media_df, decode_ppm,
    decode_wav, media_features, pack_media, sample_frames,
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


def test_jpeg_png_decode_is_pil_gated():
    with pytest.raises(NotImplementedError):
        decode_media(b"\xff\xd8rest-of-jpeg")
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG\r\n\x1a\nrest")


def _ppm_bytes(w, h, pixels):
    return b"P6\n# comment\n%d %d\n255\n" % (w, h) + pixels


def test_decode_ppm_p6_and_p5():
    pix = bytes(range(2 * 2 * 3))
    w, h, c, arr = decode_ppm(_ppm_bytes(2, 2, pix))
    assert (w, h, c) == (2, 2, 3)
    assert arr.tobytes() == pix
    gray = b"P5\n3 1\n255\n\x00\x80\xff"
    w, h, c, arr = decode_ppm(gray)
    assert (w, h, c) == (3, 1, 1)
    assert list(arr.ravel()) == [0, 128, 255]


def test_decode_bmp_24bit_bottom_up():
    # 2x2 image, rows bottom-up, BGR, stride padded to 8 bytes
    # top row: red, green ; bottom row: blue, white
    row_bottom = bytes([255, 0, 0]) + bytes([255, 255, 255]) + b"\x00\x00"
    row_top = bytes([0, 0, 255]) + bytes([0, 255, 0]) + b"\x00\x00"
    px = row_bottom + row_top  # stored bottom-up
    hdr = (
        b"BM" + struct.pack("<IHHI", 54 + len(px), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(px), 0, 0, 0, 0)
    )
    w, h, c, arr = decode_bmp(hdr + px)
    assert (w, h, c) == (2, 2, 3)
    assert list(arr[0, 0]) == [255, 0, 0]    # top-left red (RGB)
    assert list(arr[0, 1]) == [0, 255, 0]    # top-right green
    assert list(arr[1, 0]) == [0, 0, 255]    # bottom-left blue
    assert list(arr[1, 1]) == [255, 255, 255]


def _wav_bytes(rate, samples_i16):
    data = np.asarray(samples_i16, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_decode_wav_pcm16():
    rate, ch, arr = decode_wav(_wav_bytes(8000, [0, 1000, -1000, 32767]))
    assert (rate, ch) == (8000, 1)
    assert list(arr.ravel()) == [0, 1000, -1000, 32767]


def test_decode_media_df_mixed_formats(spark):
    rows = [
        (0, _ppm_bytes(2, 2, bytes(12))),
        (1, _wav_bytes(16000, [100, -100])),
        (2, pack_media(2, 0, 4, 4, 1, bytes(16))),
        (3, b"garbage-payload"),
        (4, None),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r
           for r in decode_media_df(media).orderBy("media_id").collect()}
    assert out[0]["kind"] == "ppm" and out[0]["width"] == 2
    assert out[1]["kind"] == "wav" and out[1]["sample_rate"] == 16000
    assert out[2]["kind"] == "mms" and out[2]["modality"] == "image"
    assert out[3]["kind"] is None and out[4]["kind"] is None
    assert out[1]["mean_value"] == pytest.approx(0.0)
    assert out[2]["n_values"] == 16


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
