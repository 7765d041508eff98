"""Round-trip and permissive-scan tests for the ISO 2709 codec — the
RecordReaderTest tier (core/test/src/org/solrmarc/marc/
RecordReaderTest.java:23-110: read -> write -> re-read equality)."""

import json

from marc_solr_profiling_spark.sources.marc import (
    decode_record, encode_record, raw_record_id, raw_record_ids,
    read_marc_binary, record_to_json, split_records,
)

LEADER = "00000cam a2200000 a 4500"
CONTROL = [("001", "ocm57136914"), ("008", "920403s1992    caua  j      000 0 eng  ")]
DATA = [
    ("245", "1", "0", [("a", "A title"), ("b", "with more")]),
    ("650", " ", "0", [("a", "Subject — ünïcode 标题")]),
]


def test_encode_decode_roundtrip():
    raw = encode_record(LEADER, CONTROL, DATA)
    leader, control, data = decode_record(raw)
    assert control == CONTROL
    assert data == DATA
    assert int(leader[:5]) == len(raw)  # self-describing record length


def test_split_and_raw_id():
    r1 = encode_record(LEADER, CONTROL, DATA)
    r2 = encode_record(LEADER, [("001", "u2")], [])
    parts = split_records(r1 + r2)
    assert [len(p) for p in parts] == [len(r1), len(r2)]
    assert raw_record_id(parts[0]) == "ocm57136914"
    assert raw_record_id(parts[1]) == "u2"
    assert raw_record_id(b"garbage") is None


def test_read_marc_binary_permissive(spark):
    good = encode_record(LEADER, CONTROL, DATA)
    bad = b"0009" + b"X" * 30 + b"\x1d"  # corrupt length + junk
    df = spark.createDataFrame(
        [("f1.mrc", bytearray(good + good)), ("f2.mrc", bytearray(bad))],
        "path string, content binary",
    )
    out = read_marc_binary(df).collect()
    ok = [r for r in out if r["parse_error"] is None]
    errs = [r for r in out if r["parse_error"] is not None]
    assert len(ok) == 2 and len(errs) >= 1  # permissive: quarantined, not fatal
    r = ok[0]
    assert r["record_id"] == "ocm57136914"
    assert [f["tag"] for f in r["datafields"]] == ["245", "650"]
    assert r["datafields"][1]["subfields"][0]["value"] == "Subject — ünïcode 标题"


def test_raw_record_ids_projection(spark):
    good = encode_record(LEADER, CONTROL, DATA)
    df = spark.createDataFrame(
        [("f.mrc", bytearray(good * 3))], "path string, content binary"
    )
    rows = raw_record_ids(df).collect()
    assert [r["record_id"] for r in rows] == ["ocm57136914"] * 3
    assert all(r["n_bytes"] == len(good) for r in rows)


def test_record_to_json():
    s = record_to_json(LEADER, CONTROL, DATA)
    obj = json.loads(s)
    assert obj["leader"] == LEADER
    assert obj["fields"][0] == {"001": "ocm57136914"}
    assert obj["fields"][2]["245"]["ind1"] == "1"
