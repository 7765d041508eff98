"""Vectorized delta+varbyte posting compression (numpy, no byte loops).

The physical analog of Lucene's postings encoding (the reference delegates
this to Lucene inside Solr; here it's explicit): docIDs are sorted, stored
as first-value + deltas, each integer LEB128/varbyte coded (7 data bits per
byte, high bit = continuation).

Everything is numpy array arithmetic — no per-element Python — because the
input_hint forbids row-wise Python and these run inside applyInPandas over
potentially multi-million-entry hot-term groups.
"""

from __future__ import annotations

import numpy as np

# thresholds: values below _LIMITS[i] need i+1 bytes
_LIMITS = np.array([1 << (7 * i) for i in range(1, 10)], dtype=np.uint64)


def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode a uint64 array to varbyte bytes (vectorized)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value: 1 + number of limits <= value
    nbytes = 1 + np.searchsorted(_LIMITS, v, side="right").astype(np.int64)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    max_len = int(nbytes.max())
    for k in range(max_len):
        mask = nbytes > k
        chunk = ((v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] > k + 1).astype(np.uint8) << 7
        out[starts[mask] + k] = chunk | cont
    return out.tobytes()


def varbyte_decode(buf: bytes) -> np.ndarray:
    """Decode varbyte bytes back to a uint64 array (vectorized)."""
    arr = np.frombuffer(buf, dtype=np.uint8)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (arr & 0x80) == 0
    n_values = int(is_end.sum())
    # group id per byte: 0-based index of the value this byte belongs to
    group = np.zeros(arr.size, dtype=np.int64)
    group[1:] = np.cumsum(is_end)[:-1]
    # position within group
    group_starts = np.zeros(n_values, dtype=np.int64)
    group_starts[1:] = np.flatnonzero(is_end)[:-1] + 1
    pos = np.arange(arr.size, dtype=np.int64) - group_starts[group]
    contrib = (arr & 0x7F).astype(np.uint64) << (np.uint64(7) * pos.astype(np.uint64))
    out = np.zeros(n_values, dtype=np.uint64)
    np.add.at(out, group, contrib)
    return out


def delta_encode(sorted_ids: np.ndarray) -> bytes:
    """first value + gaps, varbyte coded. Input MUST be sorted ascending."""
    ids = np.ascontiguousarray(sorted_ids, dtype=np.uint64)
    if ids.size == 0:
        return b""
    gaps = np.empty_like(ids)
    gaps[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=gaps[1:])
    return varbyte_encode(gaps)


def delta_decode(buf: bytes) -> np.ndarray:
    gaps = varbyte_decode(buf)
    return np.cumsum(gaps, dtype=np.uint64)
