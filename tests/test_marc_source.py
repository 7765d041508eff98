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


# ---------------------------------------------------------------------------
# the three wire formats round-trip (RecordReaderTest.java:23-110 tier):
# read -> write -> re-read equality for binary, MARC-in-JSON, and MARCXML
# ---------------------------------------------------------------------------


def test_marc_json_roundtrip_pure():
    from marc_solr_profiling_spark.sources.marc import parse_marc_json

    s = record_to_json(LEADER, CONTROL, DATA)
    leader, control, data = parse_marc_json(s)
    assert (leader, control, data) == (LEADER, CONTROL, DATA)
    # malformed input raises (the quarantine path)
    import pytest
    with pytest.raises(ValueError):
        parse_marc_json("{not json")
    with pytest.raises(ValueError):
        parse_marc_json('{"fields": []}')  # no leader


def test_marc_xml_roundtrip_pure():
    from marc_solr_profiling_spark.sources.marc import (
        parse_marc_xml, record_to_xml,
    )

    xml = record_to_xml(LEADER, CONTROL, DATA)
    [(leader, control, data)] = parse_marc_xml(xml)
    assert (leader, control, data) == (LEADER, CONTROL, DATA)
    # namespace-free + pretty-printed variant (MarcUnprettyXmlReader
    # whitespace tolerance, MarcUnprettyXmlReader.java:1-66)
    pretty = (
        "<collection>\n  <record>\n    <leader>" + LEADER + "</leader>\n"
        "    <controlfield tag=\"001\">ocm57136914</controlfield>\n"
        "    <datafield tag=\"245\" ind1=\"1\" ind2=\"0\">\n"
        "      <subfield code=\"a\">A title</subfield>\n"
        "    </datafield>\n  </record>\n</collection>"
    )
    [(leader2, control2, data2)] = parse_marc_xml(pretty)
    assert leader2 == LEADER
    assert control2 == [("001", "ocm57136914")]
    assert data2 == [("245", "1", "0", [("a", "A title")])]
    import pytest
    with pytest.raises(ValueError):
        parse_marc_xml("<oops>")
    with pytest.raises(ValueError):
        parse_marc_xml("<collection></collection>")


def test_read_marc_xml_and_json_dataframes(spark):
    """The reader surfaces: binary rows -> render to XML/JSON strings ->
    re-read through read_marc_xml / read_marc_json -> identical MARC rows
    (the reference's own fixtures are substantially .xml, e.g.
    core/test/data/double_007.xml via IndexSmokeTest.java:33-40)."""
    from marc_solr_profiling_spark.sources.marc import (
        read_marc_json, read_marc_xml, records_to_marc_json,
        records_to_marc_xml,
    )

    good = encode_record(LEADER, CONTROL, DATA)
    src = spark.createDataFrame(
        [("f1.mrc", bytearray(good + good))], "path string, content binary"
    )
    base = read_marc_binary(src)
    want = [
        (r["record_id"], r["leader"], r["controlfields"], r["datafields"])
        for r in base.collect()
    ]

    xml_df = records_to_marc_xml(base)
    back_xml = read_marc_xml(xml_df, xml_col="marc_xml").collect()
    got_xml = [
        (r["record_id"], r["leader"], r["controlfields"], r["datafields"])
        for r in back_xml
    ]
    assert sorted(got_xml) == sorted(want)
    assert all(r["parse_error"] is None for r in back_xml)

    json_df = records_to_marc_json(base)

    # records_to_marc_json uses Spark's to_json (struct shape); the
    # marc-in-json reader consumes the CONVENTION shape from
    # record_to_json — render via the pure fn for the round-trip
    import pandas as pd
    rows = [
        (record_to_json(
            r["leader"],
            [(c["tag"], c["data"]) for c in r["controlfields"]],
            [(d["tag"], d["ind1"], d["ind2"],
              [(s["code"], s["value"]) for s in d["subfields"]])
             for d in r["datafields"]],
        ),)
        for r in base.collect()
    ]
    jdf = spark.createDataFrame(rows, "marc_json string")
    back_json = read_marc_json(jdf, json_col="marc_json").collect()
    got_json = [
        (r["record_id"], r["leader"], r["controlfields"], r["datafields"])
        for r in back_json
    ]
    assert sorted(got_json) == sorted(want)

    # malformed rows quarantine, never raise
    badx = spark.createDataFrame([("<oops>",)], "marc_xml string")
    out = read_marc_xml(badx).collect()
    assert len(out) == 1 and out[0]["parse_error"] is not None


def test_encode_record_split_round_trip(spark):
    """MarcSplitStreamWriter semantics (MarcSplitStreamWriter.java:45-156):
    oversized records split across physical records, each repeating the
    control + non-split fields and carrying a 999 batch; the
    MarcCombiningReader side (combine_records) reassembles the original
    field multiset."""
    from marc_solr_profiling_spark.operators.marc_merge import (
        combine_records,
    )
    from marc_solr_profiling_spark.sources.marc import (
        decode_record, encode_record_split,
    )

    leader = "00000cam a2200000 a 4500"
    controls = [("001", "a42"), ("008", " " * 38)]
    keep = [("245", "1", "0", [("a", "A title")])]
    items = [
        ("999", " ", " ", [("a", f"QA{i} .B{i}"), ("i", f"barcode{i:04d}")])
        for i in range(40)
    ]
    chunks = encode_record_split(
        leader, controls, keep + items, threshold=400,
        fields_to_split=r"9..",
    )
    assert len(chunks) > 1                      # actually split
    assert all(len(c) <= 99999 for c in chunks)
    decoded = [decode_record(c) for c in chunks]
    # every chunk repeats the control + non-split fields
    for _leader, ctrl, data in decoded:
        assert ctrl == controls
        assert data[0][0] == "245"
    # chunks reassemble to the exact original 999 multiset, in order
    rows = [
        (i, "a42", d[0], d[1], d[2])
        for i, d in enumerate(decoded)
    ]
    df = spark.createDataFrame(
        rows, "seq int, record_id string, leader string,"
        "controlfields array<struct<tag:string,data:string>>,"
        "datafields array<struct<tag:string,ind1:string,ind2:string,"
        "subfields:array<struct<code:string,value:string>>>>"
    )
    combined = combine_records(df).collect()[0]
    got_999 = [
        f["subfields"][0]["value"]
        for f in combined["datafields"]
        if f["tag"] == "999"
    ]
    assert got_999 == [f"QA{i} .B{i}" for i in range(40)]
    # non-split fields present exactly once
    assert [f["tag"] for f in combined["datafields"]].count("245") == 1


def test_encode_record_split_no_split_fields_single_record():
    from marc_solr_profiling_spark.sources.marc import (
        decode_record, encode_record, encode_record_split,
    )

    leader = "00000cam a2200000 a 4500"
    controls = [("001", "a1")]
    data = [("245", "1", "0", [("a", "T")])]
    chunks = encode_record_split(leader, controls, data, threshold=10)
    assert len(chunks) == 1
    assert chunks[0] == encode_record(leader, controls, data)


def test_sniff_marc_format():
    from marc_solr_profiling_spark.sources.marc import sniff_marc_format

    raw = encode_record(LEADER, CONTROL, DATA)
    # extension wins (MarcHandler.java:367-370)
    assert sniff_marc_format("a.XML", raw) == "xml"
    assert sniff_marc_format("a.json", b"<collection/>") == "json"
    # stdin-style: no telling extension -> first non-ws byte (:400-415)
    assert sniff_marc_format(None, b"  <collection>") == "xml"
    assert sniff_marc_format("dump", b'\xef\xbb\xbf{"leader"') == "json"
    assert sniff_marc_format("dump.dat", raw) == "marc21"
    # a known-binary extension never content-sniffs ('{' can open a record)
    assert sniff_marc_format("a.mrc", b"{weird") == "marc21"


def test_split_json_objects_string_aware():
    from marc_solr_profiling_spark.sources.marc import _split_json_objects

    a = json.dumps({"x": 'brace } in { string', "y": 1})
    b = json.dumps({"z": "two\\\"quote"})
    objs = _split_json_objects(a + "\n" + b + "\n")
    assert objs == [a, b]
    # truncated trailer still surfaces (as a quarantine candidate)
    objs = _split_json_objects(a + '{"cut": ')
    assert len(objs) == 2 and objs[1].startswith('{"cut"')


def test_read_marc_any_mixed_directory(spark, tmp_path):
    """One scan over a mixed dir of .mrc/.xml/.json files -> identical
    records from each format, plus quarantine for a corrupt member."""
    from marc_solr_profiling_spark.sources.marc import (
        read_marc_any, record_to_json, record_to_xml,
    )

    raw = encode_record(LEADER, CONTROL, DATA)
    (tmp_path / "a.mrc").write_bytes(raw)
    xml = record_to_xml(LEADER, CONTROL, DATA)
    (tmp_path / "b.xml").write_text(
        xml if xml.lstrip().startswith("<collection")
        else "<collection>%s</collection>" % xml)
    j = record_to_json(LEADER, CONTROL, DATA)
    (tmp_path / "c.json").write_text(j + "\n" + j)  # concatenated objects
    (tmp_path / "d.dat").write_bytes(b"0009" + b"X" * 30 + b"\x1d")

    out = read_marc_any(
        spark.read.format("binaryFile").load(str(tmp_path))).collect()
    ok = [r for r in out if r["parse_error"] is None]
    assert len(ok) == 4  # 1 mrc + 1 xml + 2 json
    assert {r["record_id"] for r in ok} == {"ocm57136914"}
    tags = {tuple(f["tag"] for f in r["datafields"]) for r in ok}
    assert tags == {("245", "650")}
    assert any(r["parse_error"] for r in out if r["path"].endswith("d.dat"))
