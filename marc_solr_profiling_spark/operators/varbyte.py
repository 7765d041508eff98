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


def varbyte_encode_sliced(
    values: np.ndarray, starts: np.ndarray, ends: np.ndarray
) -> list[bytes]:
    """Encode ``values`` ONCE (one vectorized pass over the whole partition)
    and return one bytes object per [start, end) value-slice. This is the
    batch form used by the segment builder: with web vocabularies most
    (term, salt) groups are tiny, so per-block encode calls would pay ~µs of
    numpy dispatch per block × millions of blocks; here the dispatch cost is
    paid once per partition."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return [b"" for _ in range(len(starts))]
    nbytes = 1 + np.searchsorted(_LIMITS, v, side="right").astype(np.int64)
    byte_ends = np.cumsum(nbytes)
    byte_starts = byte_ends - nbytes
    out = np.zeros(int(byte_ends[-1]), dtype=np.uint8)
    max_len = int(nbytes.max())
    for k in range(max_len):
        mask = nbytes > k
        chunk = ((v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] > k + 1).astype(np.uint8) << 7
        out[byte_starts[mask] + k] = chunk | cont
    buf = out.tobytes()
    # value-slice [s, e) -> byte-slice [byte_starts[s], byte_ends[e-1])
    bs = byte_starts[starts]
    be = np.where(ends > starts, byte_ends[np.maximum(ends - 1, 0)], bs)
    return [buf[s:e] for s, e in zip(bs.tolist(), be.tolist())]


def delta_gaps_blocked(ids: np.ndarray, block_starts: np.ndarray) -> np.ndarray:
    """Per-block delta transform in one pass: gap[i] = ids[i] - ids[i-1],
    except at each block start where the full id is kept (blocks decode
    independently). ``ids`` must be sorted ascending within each block."""
    v = np.ascontiguousarray(ids, dtype=np.uint64)
    gaps = np.empty_like(v)
    if v.size == 0:
        return gaps
    gaps[0] = v[0]
    np.subtract(v[1:], v[:-1], out=gaps[1:])
    gaps[block_starts] = v[block_starts]
    return gaps


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
