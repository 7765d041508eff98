"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The reference is text-only, but a web-scale training-data pipeline carries
media next to text (the ``html:binary`` column of the input_hint already set
the pattern: opaque bytes + extraction UDF). The Spark-side plumbing —
schema, partitioning, UDF signatures, batch shapes — is real, and so is
decode for the standard UNCOMPRESSED wire formats: binary PPM/PGM images,
24-bit BMP, and PCM WAV audio are parsed in pure numpy (decode_ppm /
decode_bmp / decode_wav, dispatched by magic bytes in decode_media).
Compressed codecs (JPEG/PNG) stay gated behind an import-try
``NotImplementedError`` — the container ships no image libraries; a
deployment wires PIL/libav into the same dispatch without touching any
plan shape.

Fake container format (deterministic, used by tests and the synthetic
corpus): ``b"MMS0" + modality:1 + width:uint16 + height:uint16 +
n_frames:uint16 + payload bytes``. Little-endian.

Scale notes: every stage here is per-row/shuffle-free (mapInPandas over
binary columns); Arrow moves the bytes executor-side without per-row Python
boxing. Frame sampling fans out rows but stays partition-local.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"MMS0"
MODALITIES = {0: "image", 1: "audio", 2: "video"}

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


def pack_media(media_id: int, modality: int, width: int, height: int,
               n_frames: int, body: bytes) -> bytes:
    """Encode one fake-container payload (test/corpus helper)."""
    return MAGIC + struct.pack("<BHHH", modality, width, height, n_frames) + body


def synthetic_media(spark, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table in MEDIA_SCHEMA shape."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                rng = np.random.default_rng(seed * 7919 + i)
                mod = i % 3
                w, h = int(rng.integers(8, 64)), int(rng.integers(8, 64))
                nf = 1 if mod == 0 else int(rng.integers(2, 9))
                body = rng.integers(0, 256, w * h * nf, dtype=np.uint8).tobytes()
                rows.append(
                    (
                        i,
                        MODALITIES[mod],
                        pack_media(i, mod, w, h, nf, body),
                        (w, h, nf, len(body)),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "modality", "payload", "meta"]
            )

    return spark.range(n_rows).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _parse_header(payload: bytes | None):
    if payload is None or len(payload) < 11 or payload[:4] != MAGIC:
        return None
    mod, w, h, nf = struct.unpack("<BHHH", payload[4:11])
    return mod, w, h, nf, payload[11:]


# ---------------------------------------------------------------------------
# real codecs (pure numpy — standard uncompressed wire formats)
# ---------------------------------------------------------------------------


def decode_ppm(data: bytes):
    """Decode binary PPM (P6, RGB) / PGM (P5, gray): ASCII header
    (magic, width, height, maxval; '#' comments allowed) + raw samples.
    Returns (width, height, channels, uint8 ndarray [h, w, c])."""
    if not data.startswith((b"P6", b"P5")):
        raise ValueError("not a binary PPM/PGM")
    channels = 3 if data[:2] == b"P6" else 1
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    n = w * h * channels
    arr = np.frombuffer(data, dtype=np.uint8, count=n, offset=pos)
    return w, h, channels, arr.reshape(h, w, channels)


def decode_bmp(data: bytes):
    """Decode uncompressed 24-bit BMP (BITMAPINFOHEADER): rows are
    bottom-up, 4-byte padded, BGR order. Returns (w, h, 3, uint8 [h, w, 3]
    in RGB)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack("<I", data[10:14])[0]
    hdr_size = struct.unpack("<I", data[14:18])[0]
    if hdr_size < 40:
        raise ValueError("BMP core header unsupported")
    w, h = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    comp = struct.unpack("<I", data[30:34])[0]
    if bpp != 24 or comp != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * h, offset=off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if flip:
        rows = rows[::-1]
    return w, h, 3, rows[..., ::-1]  # BGR -> RGB


def decode_wav(data: bytes):
    """Decode RIFF/WAVE PCM (8- or 16-bit): returns (sample_rate,
    n_channels, int16 ndarray [n_samples, n_channels])."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, fmt, samples = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            samples = body
        pos += 8 + size + (size & 1)
    if fmt is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits not in (8, 16):
        raise ValueError("only 8/16-bit PCM supported")
    if bits == 16:
        arr = np.frombuffer(samples, dtype="<i2")
    else:
        arr = (np.frombuffer(samples, dtype=np.uint8).astype(np.int16) - 128) << 8
    n = (arr.size // n_ch) * n_ch
    return rate, n_ch, arr[:n].reshape(-1, n_ch)


def decode_media(payload: bytes | None):
    """Dispatch on magic bytes: returns a dict with ``kind`` plus decoded
    fields, or None for null/undecodable payloads.

    Real decodes (pure numpy, standard formats): PPM/PGM, uncompressed
    24-bit BMP, PCM WAV. The deterministic MMS0 test container decodes via
    its header. Compressed formats (JPEG/PNG) raise NotImplementedError
    unless PIL is importable — the sandbox has no image libs; a deployment
    wires PIL here without touching any plan shape.
    """
    if payload is None or len(payload) < 4:
        return None
    if payload[:4] == MAGIC:
        parsed = _parse_header(payload)
        if parsed is None:
            return None
        mod, w, h, nf, body = parsed
        return {"kind": "mms", "modality": MODALITIES[mod], "width": w,
                "height": h, "n_frames": nf,
                "pixels": np.frombuffer(body, dtype=np.uint8)}
    if payload[:2] in (b"P6", b"P5"):
        w, h, c, arr = decode_ppm(payload)
        return {"kind": "ppm", "modality": "image", "width": w, "height": h,
                "channels": c, "pixels": arr}
    if payload[:2] == b"BM":
        w, h, c, arr = decode_bmp(payload)
        return {"kind": "bmp", "modality": "image", "width": w, "height": h,
                "channels": c, "pixels": arr}
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        rate, n_ch, arr = decode_wav(payload)
        return {"kind": "wav", "modality": "audio", "sample_rate": rate,
                "channels": n_ch, "samples": arr}
    if payload[:2] == b"\xff\xd8" or payload[:8] == b"\x89PNG\r\n\x1a\n":
        try:
            import PIL.Image  # noqa: F401
        except ImportError as e:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "JPEG/PNG need PIL, absent in this environment; "
                "PPM/BMP/WAV decode natively"
            ) from e
        raise NotImplementedError("PIL path not wired in sandbox")
    return None


DECODE_SCHEMA = (
    "media_id long, kind string, modality string, width int, height int, "
    "channels int, sample_rate int, mean_value double, n_values long"
)


def decode_media_df(media: DataFrame) -> DataFrame:
    """Decode stage over arbitrary payloads (standard formats + the MMS0
    container): one Arrow-batched pass, per-row dispatch on magic bytes,
    undecodable rows quarantined as kind=NULL rows (never an exception)."""

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    d = decode_media(payload)
                except (ValueError, NotImplementedError):
                    d = None
                if d is None:
                    out.append((mid, None, None, None, None, None, None,
                                None, None))
                    continue
                vals = d.get("pixels", d.get("samples"))
                flat = vals.astype(np.float64).ravel() if vals is not None else None
                out.append(
                    (
                        mid,
                        d["kind"],
                        d["modality"],
                        d.get("width"),
                        d.get("height"),
                        d.get("channels"),
                        d.get("sample_rate"),
                        float(flat.mean()) if flat is not None and flat.size else None,
                        int(flat.size) if flat is not None else None,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "kind", "modality", "width", "height",
                    "channels", "sample_rate", "mean_value", "n_values",
                ],
            )

    return media.mapInPandas(dec, schema=DECODE_SCHEMA)


FEATURE_SCHEMA = (
    "media_id long, modality string, width int, height int, n_frames int, "
    "mean_byte double, payload_md5 string"
)


def media_features(media: DataFrame) -> DataFrame:
    """Batch feature extraction over the payload column: header fields +
    mean byte value (the 'embedding' stand-in) + content digest. One
    vectorized pass per Arrow batch; rows with unparsable payloads are
    dropped to a null-feature row (quarantine-style, never an exception)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, mod, payload in zip(
                pdf["media_id"], pdf["modality"], pdf["payload"]
            ):
                parsed = _parse_header(payload)
                if parsed is None:
                    out.append((mid, mod, None, None, None, None, None))
                    continue
                _, w, h, nf, body = parsed
                arr = np.frombuffer(body, dtype=np.uint8)
                out.append(
                    (
                        mid,
                        mod,
                        w,
                        h,
                        nf,
                        float(arr.mean()) if arr.size else None,
                        hashlib.md5(body).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "modality", "width", "height", "n_frames",
                    "mean_byte", "payload_md5",
                ],
            )

    return media.mapInPandas(feats, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx int, frame_bytes binary"


def sample_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """Video frame sampling: explode each video payload into every-Nth
    frame's bytes. Fan-out stays partition-local (no shuffle); at 100 TB the
    downstream feature stage sees bounded rows because ``every`` caps the
    expansion."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, idxs, blobs = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                parsed = _parse_header(payload)
                if parsed is None:
                    continue
                _, w, h, nf, body = parsed
                fsize = w * h
                for fi in range(0, nf, every):
                    mids.append(mid)
                    idxs.append(fi)
                    blobs.append(body[fi * fsize:(fi + 1) * fsize])
            yield pd.DataFrame(
                {"media_id": mids, "frame_idx": idxs, "frame_bytes": blobs}
            )

    return media.filter(F.col("modality") == "video").mapInPandas(
        frames, schema=FRAME_SCHEMA
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stage. The PLAN (schema, batching, partition shape) is
    real; the pixel resample is a deterministic nearest-neighbor over the
    fake container (a real deployment swaps in PIL inside the same UDF)."""

    out_schema = "media_id long, payload binary"

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, blobs = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                parsed = _parse_header(payload)
                if parsed is None:
                    continue
                mod, w, h, nf, body = parsed
                frame = np.frombuffer(body[: w * h], dtype=np.uint8)
                if frame.size < w * h:
                    continue
                img = frame.reshape(h, w)
                yi = (np.arange(height) * h // height)
                xi = (np.arange(width) * w // width)
                resized = img[np.ix_(yi, xi)].tobytes()
                mids.append(mid)
                blobs.append(pack_media(mid, mod, width, height, 1, resized))
            yield pd.DataFrame({"media_id": mids, "payload": blobs})

    return media.filter(F.col("modality") == "image").mapInPandas(
        resize, schema=out_schema
    )
