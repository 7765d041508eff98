"""Property-based tests (hypothesis) for the pure codecs and key scalar
functions: the round-trip and invariant laws that example-based tests can
only spot-check. Everything here is driver-side pure Python/numpy — no
SparkSession — so the tier runs in seconds.
"""
from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# varbyte posting codec
# ---------------------------------------------------------------------------

gaps = st.lists(st.integers(min_value=0, max_value=2**40), min_size=0,
                max_size=300)


@settings(max_examples=200, deadline=None)
@given(gaps)
def test_varbyte_roundtrip(values):
    from marc_solr_profiling_spark.operators.varbyte import (
        varbyte_decode, varbyte_encode,
    )

    arr = np.asarray(values, dtype=np.int64)
    enc = varbyte_encode(arr)
    dec = varbyte_decode(enc)
    assert dec.tolist() == values


# ---------------------------------------------------------------------------
# ISO 2709 record codec
# ---------------------------------------------------------------------------

subfield_text = st.text(
    alphabet=st.characters(blacklist_characters="\x1d\x1e\x1f",
                           blacklist_categories=("Cs",)),
    max_size=80,
)
tag3 = st.from_regex(r"[0-9]{3}", fullmatch=True).filter(lambda t: t >= "010")
ind = st.sampled_from([" ", "0", "1", "9"])
code1 = st.from_regex(r"[a-z0-9]", fullmatch=True)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.tuples(tag3, ind, ind,
                       st.lists(st.tuples(code1, subfield_text),
                                min_size=1, max_size=4)),
             max_size=6),
    subfield_text,
)
def test_marc_binary_roundtrip(datafields, f008):
    from marc_solr_profiling_spark.sources.marc import (
        decode_record, encode_record,
    )

    leader = "00000cam a2200000 a 4500"
    control = [("001", "rec1"), ("008", f008.replace("\n", " "))]
    data = [(t, i1, i2, subs) for t, i1, i2, subs in datafields]
    raw = encode_record(leader, control, data)
    lr, cr, dr = decode_record(raw)
    assert cr == control
    assert dr == data
    assert int(lr[:5]) == len(raw)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(code1, subfield_text), min_size=1, max_size=40))
def test_marc_split_stream_combine_identity(subs):
    """split -> combine == identity regardless of how many chunks the
    999-field payload forces (the MarcSplitStreamWriter contract): every
    chunk repeats the non-split fields, and the per-chunk 999 runs
    concatenate back to the original sequence."""
    from marc_solr_profiling_spark.sources.marc import (
        decode_record, encode_record_split,
    )

    leader = "00000cam a2200000 a 4500"
    control = [("001", "x1")]
    keep = [("245", "1", "0", [("a", "t")])]
    items = [("999", " ", " ", subs) for _ in range(6)]
    chunks = encode_record_split(leader, control, keep + items,
                                 threshold=500)
    assert len(chunks) >= 1
    combined = []
    for c in chunks:
        _, ctrl, d = decode_record(c)
        assert ctrl == control
        assert [f for f in d if f[0] != "999"] == keep
        combined += [f for f in d if f[0] == "999"]
    assert combined == items


# ---------------------------------------------------------------------------
# WARC record codec
# ---------------------------------------------------------------------------

url_st = st.from_regex(r"https?://[a-z0-9.]{1,20}/[a-zA-Z0-9/._-]{0,30}",
                       fullmatch=True)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(url_st, st.binary(max_size=500)),
                min_size=1, max_size=8))
def test_warc_stream_roundtrip(pages):
    from marc_solr_profiling_spark.sources.warc import (
        gzip_member, page_to_warc_response, parse_warc,
        split_http_response,
    )

    stream = b"".join(
        gzip_member(page_to_warc_response(u, None, b)) for u, b in pages)
    parsed = parse_warc(stream)
    assert len(parsed) == len(pages)
    for (u, b), (headers, block, err) in zip(pages, parsed):
        assert err is None
        assert headers["WARC-Target-URI"] == u
        assert split_http_response(block)[2] == b


# ---------------------------------------------------------------------------
# scalar laws
# ---------------------------------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(st.text(max_size=60))
def test_clean_data_fixpoint_is_idempotent(s):
    from marc_solr_profiling_spark.functions.cleaning import clean_data

    once = clean_data(s)
    assert clean_data(once) == once


@settings(max_examples=200, deadline=None)
@given(st.lists(st.from_regex(r"[a-z0-9]{1,6}", fullmatch=True),
                min_size=0, max_size=30))
def test_natural_sort_key_orders_numeric_runs(tokens):
    from marc_solr_profiling_spark.functions.cleaning import natural_sort_key

    # law: on pure digit strings the key order equals numeric order
    nums = [t for t in tokens if t.isdigit()]
    by_key = sorted(nums, key=natural_sort_key)
    assert by_key == sorted(nums, key=int)
