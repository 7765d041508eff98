"""Round-trip tests for the posting compression layer (the analog of the
reference's reader/writer round-trip tier, ``RecordReaderTest.java:23-110``),
including property-based coverage via hypothesis."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from marc_solr_profiling_spark.operators.varbyte import (
    delta_decode,
    delta_encode,
    varbyte_decode,
    varbyte_encode,
)


def test_empty():
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0
    assert delta_encode(np.array([], dtype=np.uint64)) == b""


def test_known_values():
    # 0 and 127 fit one byte; 128 needs two
    assert varbyte_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varbyte_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varbyte_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"


def test_boundaries():
    vals = [0, 1, 127, 128, 16383, 16384, 2**21 - 1, 2**21,
            2**32, 2**53, 2**63, 2**64 - 1]
    arr = np.array(vals, dtype=np.uint64)
    out = varbyte_decode(varbyte_encode(arr))
    assert out.tolist() == vals


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500))
def test_roundtrip_random(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert varbyte_decode(varbyte_encode(arr)).tolist() == vals


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1,
                max_size=300, unique=True))
def test_delta_roundtrip(ids):
    arr = np.array(sorted(ids), dtype=np.uint64)
    assert delta_decode(delta_encode(arr)).tolist() == sorted(ids)


def test_compression_wins_on_dense_ids():
    ids = np.arange(10_000, dtype=np.uint64) * 3 + 1_000_000
    enc = delta_encode(ids)
    assert len(enc) < ids.size * 2  # gaps of 3 -> ~1 byte each (+first)
