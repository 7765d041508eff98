"""MARC-8 (ANSEL) -> Unicode conversion + unicode-normalize decorator —
the MarcTranslatedReader analog (MarcTranslatedReader.java:41-130).
Fixture values use the public LOC MARC-8 code table: combining marks
PRECEDE the base char in MARC-8 and FOLLOW it in Unicode.
"""

import unicodedata

import pytest

from marc_solr_profiling_spark.sources.marc import (
    decode_record,
    encode_record,
    read_marc_binary,
)
from marc_solr_profiling_spark.sources.marc8 import (
    is_utf8_record,
    marc8_to_unicode,
    normalize_records,
)


# ---------------------------------------------------------------- pure fn

def test_ascii_passthrough():
    assert marc8_to_unicode(b"plain ASCII text 123") == "plain ASCII text 123"


def test_combining_reorder_acute():
    # MARC-8: acute (0xE2) BEFORE 'e' -> Unicode 'e' + U+0301
    assert marc8_to_unicode(b"caf\xe2e") == "café"
    assert unicodedata.normalize("NFC", marc8_to_unicode(b"caf\xe2e")) == "café"


def test_multiple_combining_marks_on_one_base():
    # umlaut (0xE8) + macron (0xE5) + 'a': marc4j emits base then marks
    # in reverse buffer order (innermost mark last applied)
    got = marc8_to_unicode(b"\xe8\xe5a")
    assert got[0] == "a" and set(got[1:]) == {"̈", "̄"}


def test_ansel_special_chars():
    assert marc8_to_unicode(b"\xa1\xb1") == "Łł"
    assert marc8_to_unicode(b"\xa5\xb5") == "Ææ"
    assert marc8_to_unicode(b"\xb2") == "ø"
    assert marc8_to_unicode(b"\xc3") == "©"
    assert marc8_to_unicode(b"\xb9") == "£"


def test_cedilla_and_tilde():
    assert marc8_to_unicode(b"gar\xf0con") == "garçon"
    assert unicodedata.normalize(
        "NFC", marc8_to_unicode(b"Espa\xe4na")) == "España"


def test_unknown_high_byte_is_replacement():
    assert marc8_to_unicode(b"\xbf") == "�"


def test_escape_superscript_and_reset():
    # ESC p -> superscript digits; ESC s -> back to Basic Latin
    assert marc8_to_unicode(b"x\x1bp2\x1bs2") == "x²2"


def test_escape_subscript_and_greek():
    assert marc8_to_unicode(b"H\x1bb2\x1bsO") == "H₂O"
    assert marc8_to_unicode(b"\x1bga\x1bs-ray") == "α-ray"


def test_escape_basic_latin_designation():
    # ESC ( B is an explicit Basic-Latin designation, not an error
    assert marc8_to_unicode(b"\x1bp3\x1b(Bz") == "³z"


def test_eacc_designation_replaced_not_fatal():
    got = marc8_to_unicode(b"a\x1b$1abcdef\x1bsz")
    assert got.startswith("a") and got.endswith("z") and "�" in got


def test_trailing_orphan_combining_kept():
    assert marc8_to_unicode(b"ab\xe2") == "ab\u0301"


# ------------------------------------------------------------------ EACC

def test_eacc_triples_consume_three_bytes_and_count():
    from marc_solr_profiling_spark.sources.marc8 import marc8_decode

    # two unmapped triples between designation and return-to-latin:
    # exactly TWO replacement chars (not one per byte), and a counted note
    text, err = marc8_decode(b"a\x1b$1!!!\x22\x22\x22\x1b(Bz")
    assert text == "a\ufffd\ufffdz"
    assert err == "charset: 2 unmapped EACC code(s)"


def test_eacc_loaded_table_round_trip():
    from marc_solr_profiling_spark.sources.marc8 import (
        _EACC_CHARS,
        load_eacc_table,
        marc8_decode,
    )

    # mechanics under a pinned test table (overrides the bundled LOC
    # table for these codes): 0x212321 -> one CJK char
    n = load_eacc_table("# comment\n212321 4E2D\n214E5C 6587\n")
    try:
        assert n == 2
        text, err = marc8_decode(b"\x1b$1!#!!N\\\x1b(B!")
        assert text == "\u4e2d\u6587!"
        assert err is None
        # G1 designation form ESC $ ) 1 with high-bit-set triple bytes
        text_g1, err_g1 = marc8_decode(b"\x1b$)1\xa1\xa3\xa1\x1b(B")
        assert text_g1 == "\u4e2d"
        assert err_g1 is None
    finally:
        import marc_solr_profiling_spark.sources.marc8 as _m8

        _EACC_CHARS.clear()
        _m8._EACC_LOADED = False  # let the bundle reload for later tests


def test_eacc_space_and_separators_pass_through():
    from marc_solr_profiling_spark.sources.marc8 import (
        _EACC_CHARS,
        load_eacc_table,
        marc8_decode,
    )

    load_eacc_table("212321 4E2D\n")
    try:
        # space between triples is NOT consumed as a code byte
        text, err = marc8_decode(b"\x1b$1!#! !#! \x1b(B")
        assert text == "\u4e2d \u4e2d "
        assert err is None
    finally:
        import marc_solr_profiling_spark.sources.marc8 as _m8

        _EACC_CHARS.clear()
        _m8._EACC_LOADED = False  # let the bundle reload for later tests


def test_eacc_truncated_triple_does_not_desync():
    from marc_solr_profiling_spark.sources.marc8 import marc8_decode

    # a lone byte before the return escape: consumed as ONE replacement,
    # the escape still honored, and the note says truncated
    text, err = marc8_decode(b"\x1b$1!\x1b(Bz")
    assert text == "\ufffdz"
    assert "truncated multibyte" in err


def test_eacc_alternate_g0_designation_form():
    from marc_solr_profiling_spark.sources.marc8 import marc8_decode

    # ESC $ , 1 is the other G0 EACC form
    text, err = marc8_decode(b"\x1b$,1!!!\x1b(B")
    assert text == "\ufffd"
    assert "unmapped EACC" in err


def test_is_utf8_record():
    assert is_utf8_record("00000cam a2200000 a 4500"[:9] + "a" + "2200000")
    assert not is_utf8_record("000000000 0000000000000")


# ------------------------------------------------------- decode integration

def _record_bytes(value_bytes: bytes, coding: bytes = b" ") -> bytes:
    """Hand-assemble one ISO 2709 record whose 245$a holds raw bytes."""
    body = b"10\x1fa" + value_bytes + b"\x1e"
    directory = b"245" + f"{len(body):04d}".encode() + b"00000" + b"\x1e"
    base = 24 + len(directory)
    payload = body + b"\x1d"
    total = base + len(payload)
    leader = (f"{total:05d}".encode() + b"cam " + coding + b"22"
              + f"{base:05d}".encode() + b" a 4500")
    assert len(leader) == 24
    return leader + directory + payload


def test_decode_record_marc8_auto_converts_non_utf8():
    raw = _record_bytes(b"caf\xe2e", coding=b" ")
    _, _, data = decode_record(raw, marc8="auto")
    assert data[0][3][0][1] == "café"
    # default stays the legacy utf-8-replace behavior
    _, _, data_legacy = decode_record(raw)
    assert "́" not in data_legacy[0][3][0][1]


def test_decode_record_marc8_auto_skips_utf8_records():
    raw = _record_bytes("caf\u00e9".encode("utf-8"), coding=b"a")
    _, _, data = decode_record(raw, marc8="auto")
    assert data[0][3][0][1] == "caf\u00e9"


def test_read_marc_binary_eacc_soft_quarantine(spark):
    # a MARC-8 record with unmapped EACC content: the record still flows
    # (decoded fields present) but parse_error carries the charset note,
    # so `parse_error IS NULL` keeps selecting clean records.
    # 0x212322 (!#") is absent from the bundled LOC table; 0x212321 used
    # to be the probe here but the bundle now maps it (U+3000).
    raw = _record_bytes(b'\x1b$1!#"\x1b(B ok', coding=b" ")
    clean = _record_bytes(b"caf\xe2e", coding=b" ")
    df = spark.createDataFrame(
        [("f1", bytearray(raw + clean))], "path string, content binary")
    rows = read_marc_binary(df, marc8="auto").orderBy("seq").collect()
    assert rows[0]["parse_error"] == "charset: 1 unmapped EACC code(s)"
    assert rows[0]["leader"] is not None  # record kept, not dropped
    assert rows[0]["datafields"][0]["subfields"][0]["value"].endswith(" ok")
    assert rows[1]["parse_error"] is None


def test_read_marc_binary_marc8_auto(spark):
    raw = _record_bytes(b"Dvo\xe9r\xe2ak", coding=b" ")
    df = spark.createDataFrame([("f1", bytearray(raw))], "path string, content binary")
    row = read_marc_binary(df, marc8="auto").collect()[0]
    val = row["datafields"][0]["subfields"][0]["value"]
    assert unicodedata.normalize("NFC", val) == "Dvo\u0159\u00e1k"


# ----------------------------------------------------- normalize operator

def test_normalize_records_nfc(spark):
    rec = (
        "id1",
        "00000cam a2200000 a 4500",
        [("008", "dummy")],
        [("245", "1", "0", [("a", "café"), ("b", None)])],
    )
    df = spark.createDataFrame(
        [rec], "record_id string, leader string,"
        " controlfields array<struct<tag:string,data:string>>,"
        " datafields array<struct<tag:string,ind1:string,ind2:string,"
        " subfields:array<struct<code:string,value:string>>>>",
    )
    out = normalize_records(df, "C").collect()[0]
    assert out["datafields"][0]["subfields"][0]["value"] == "caf\u00e9"
    assert out["datafields"][0]["subfields"][1]["value"] is None
    # control fields and leader untouched
    assert out["controlfields"][0]["data"] == "dummy"
    assert out["leader"] == rec[1]
    # KD decomposes compatibility forms
    out_kd = normalize_records(df, "KD").collect()[0]
    assert out_kd["datafields"][0]["subfields"][0]["value"] == "café"


def test_normalize_records_bad_mode(spark):
    df = spark.createDataFrame([("x",)], "record_id string")
    with pytest.raises(ValueError):
        normalize_records(df.withColumn("datafields", df.record_id), "Q")


def test_roundtrip_after_conversion(spark):
    """MARC-8 record -> auto-convert -> encode -> re-decode as UTF-8:
    values survive byte-exactly (the converted record is now UTF-8)."""
    raw = _record_bytes(b"M\xe8uller", coding=b" ")
    leader, control, data = decode_record(raw, marc8="auto")
    enc = encode_record(leader, control, data)
    _, _, data2 = decode_record(enc)
    assert data2[0][3][0][1] == data[0][3][0][1] == "Müller"


def test_eacc_bundled_table_decodes_cjk():
    """The bundled LOC EACC table (sources/eacc_data.py, 15,738 entries)
    decodes real EACC escape sequences to CJK text — well-known code
    points checked against the published table: 0x213034 = 中 (U+4E2D),
    0x212F30 = 〇 (U+3007), 0x212321 = ideographic space (U+3000)."""
    from marc_solr_profiling_spark.sources.eacc_data import eacc_table
    from marc_solr_profiling_spark.sources.marc8 import marc8_decode

    t = eacc_table()
    assert len(t) == 15738
    assert t[0x213034] == "中"
    assert t[0x212F30] == "〇"
    # ESC $ 1 <triple 中><triple 〇> ESC ( B back to Latin
    text, err = marc8_decode(b"\x1b$1!04!/0\x1b(B ok")
    assert err is None
    assert text == "中〇 ok"


def test_eacc_round_trip_through_reader(spark):
    """An 880 vernacular field's EACC payload decodes to CJK through the
    binary reader with NO quarantine note (the pre-bundle behavior was
    counted U+FFFD + parse_error)."""
    from tests.test_marc8 import _record_bytes  # self-import for clarity

    raw = _record_bytes(b"\x1b$1!04!/0\x1b(B shan", coding=b" ")
    df = spark.createDataFrame(
        [("f1", bytearray(raw))], "path string, content binary")
    rows = read_marc_binary(df, marc8="auto").collect()
    assert rows[0]["parse_error"] is None
    val = rows[0]["datafields"][0]["subfields"][0]["value"]
    assert val.startswith("中〇")
