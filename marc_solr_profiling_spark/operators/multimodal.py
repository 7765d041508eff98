"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The reference is text-only, but a web-scale training-data pipeline carries
media next to text (the ``html:binary`` column of the input_hint already set
the pattern: opaque bytes + extraction UDF). This module makes the
Spark-side plumbing real — schema, partitioning, UDF signatures, batch
shapes — while the codec step is STUBBED: the container has no image/audio
libraries, so "decode" parses a deterministic fake header format and the
real-codec entry points raise ``NotImplementedError`` behind an import-try
(swap in PIL/libav on a real cluster without touching the plan shape).

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


def decode_real(payload: bytes):  # pragma: no cover - gated stub
    """Real-codec decode entry point. The sandbox image/audio libs are
    absent, so this raises; a deployment wires PIL/torchaudio here."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real media codecs unavailable in this environment; "
            "use the fake-container path (decode via _parse_header)"
        ) from e
    raise NotImplementedError("real decode not wired")


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
