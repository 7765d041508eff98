"""HathiJsonToMarc converter tests — envelope unwrap, the fix880field
script-pair retag ladder, and make856fields synthesis
(core/src/org/solrmarc/tools/HathiJsonToMarc.java:1-504,
HathiJsonReaderTest.java tier)."""

import json

from marc_solr_profiling_spark.sources.hathi import (
    HANDLE_PREFIX, fix_880_fields, make_856_fields, parse_hathi_json,
    read_hathi_json,
)
from marc_solr_profiling_spark.sources.marc import record_to_xml

LEADER = "00000cam a2200000 a 4500"


def _envelope(datafields, control=None):
    xml = record_to_xml(
        LEADER, control or [("001", "h1")], datafields
    )
    doc = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<collection xmlns="http://www.loc.gov/MARC21/slim">'
        + xml.replace(' xmlns="http://www.loc.gov/MARC21/slim"', "")
        + "</collection>"
    )
    return json.dumps({"id": "h1", "marc-xml": doc})


def test_fix_880_retags_vernacular_side():
    latin = ("245", "1", "0", [("6", "01"), ("a", "A latin title")])
    cyrillic = ("245", "1", "0", [("6", "01"), ("a", "Заглавие книги")])
    fixed = fix_880_fields([latin, cyrillic])
    assert [f[0] for f in fixed] == ["245", "880"]
    # original keeps its tag, $6 -> 880-occurrence
    assert ("6", "880-01") in fixed[0][3]
    # vernacular side is retagged, $6 -> origTag-occurrence
    assert ("6", "245-01") in fixed[1][3]
    assert ("a", "Заглавие книги") in fixed[1][3]

    # order-independent: vernacular listed first retags the same way
    fixed2 = fix_880_fields([cyrillic, latin])
    assert sorted(f[0] for f in fixed2) == ["245", "880"]
    v = next(f for f in fixed2 if f[0] == "880")
    assert ("a", "Заглавие книги") in v[3]


def test_fix_880_drops_exact_duplicate():
    a = ("700", "1", " ", [("6", "02"), ("a", "Same, Name")])
    b = ("700", "1", " ", [("6", "02"), ("a", "Same, Name")])
    fixed = fix_880_fields([a, b])
    assert len(fixed) == 1
    assert fixed[0][0] == "700"


def test_fix_880_leaves_unpaired_and_existing_880():
    solo = ("245", "1", "0", [("6", "03"), ("a", "No pair")])
    real_880 = ("880", "1", "0", [("6", "245-04"), ("a", "已有")])
    plain = ("260", " ", " ", [("a", "Publisher")])
    fixed = fix_880_fields([solo, real_880, plain])
    assert fixed == [solo, real_880, plain]


def test_make_856_full_view_only_natural_order():
    items = [
        ("974", " ", " ", [("u", "mdp.10"), ("r", "pd"), ("z", "v.10")]),
        ("974", " ", " ", [("u", "mdp.2"), ("r", "pdus"), ("z", "v.2")]),
        ("974", " ", " ", [("u", "mdp.9"), ("r", "ic"), ("z", "v.9")]),
        ("974", " ", " ", [("u", "mdp.w"), ("r", "world")]),
        ("974", " ", " ", [("r", "pd"), ("z", "no ident")]),
    ]
    out = make_856_fields(items)
    links = [f for f in out if f[0] == "856"]
    # 'ic' rights and the $u-less item excluded; natural order v.2 < v.10,
    # the label-less item sorts by its ident
    assert [dict(f[3])["u"] for f in links] == [
        HANDLE_PREFIX + "mdp.w",
        HANDLE_PREFIX + "mdp.2",
        HANDLE_PREFIX + "mdp.10",
    ]
    assert links[1][1] == "4" and links[1][2] == " "
    assert dict(links[1][3])["r"] == "pdus"
    assert dict(links[1][3])["z"] == "v.2"
    # label-less item emits no $z (reference's split-drops-empty behavior)
    assert "z" not in dict(links[0][3])


def test_make_856_empty_z_keys_on_label_not_ident():
    # $z present-but-empty keys the sort map on the (empty) LABEL, like
    # the reference's labelField != null check: two empty-label items
    # collapse keep-LAST, and the empty key sorts before any ident key
    items = [
        ("974", " ", " ", [("u", "mdp.first"), ("r", "pd"), ("z", "")]),
        ("974", " ", " ", [("u", "mdp.second"), ("r", "pd"), ("z", "")]),
        ("974", " ", " ", [("u", "mdp.plain"), ("r", "pd")]),
    ]
    out = make_856_fields(items)
    links = [f for f in out if f[0] == "856"]
    assert [dict(f[3])["u"] for f in links] == [
        HANDLE_PREFIX + "mdp.second",  # empty label key, last wins
        HANDLE_PREFIX + "mdp.plain",   # no $z at all -> ident key
    ]


def test_parse_hathi_json_end_to_end():
    latin = ("245", "1", "0", [("6", "01"), ("a", "Title")])
    vern = ("245", "1", "0", [("6", "01"), ("a", "Заглавие")])
    item = ("974", " ", " ", [("u", "uc1.b1"), ("r", "pd"), ("z", "c.1")])
    env = _envelope([latin, vern, item])
    recs = parse_hathi_json(env, add_856=True)
    assert len(recs) == 1
    leader, control, data = recs[0]
    assert ("001", "h1") in control
    tags = [f[0] for f in data]
    assert tags == ["245", "880", "974", "856"]

    # fraction-slash normalization (HathiJsonToMarc.java:231)
    env2 = _envelope([("245", "1", "0", [("a", "1⁄2 of it")])])
    (_, _, d2), = parse_hathi_json(env2)
    assert dict(d2[0][3])["a"] == "1/2 of it"


def test_parse_hathi_json_malformed():
    import pytest

    with pytest.raises(ValueError):
        parse_hathi_json("not json {")
    with pytest.raises(ValueError):
        parse_hathi_json(json.dumps({"id": "x"}))  # no marc-xml


def test_read_hathi_json_dataframe(spark):
    envs = [
        _envelope([("245", "1", "0", [("a", "Spark row one")])]),
        "broken {",
    ]
    df = spark.createDataFrame([(e,) for e in envs], "value string")
    out = read_hathi_json(df, "value").collect()
    ok = [r for r in out if r.parse_error is None]
    bad = [r for r in out if r.parse_error is not None]
    assert len(ok) == 1 and len(bad) == 1
    assert ok[0].record_id == "h1"
    assert ok[0].datafields[0].subfields[0].value == "Spark row one"
