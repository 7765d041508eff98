"""The prof_index.properties compiler (plans/profile.py): spec parsing,
the perRecordInit staged state (items / lcCallnums / formats set), every
custom-method dispatch, cardinality rules, the delete-if-empty gate, and
the one-pass facet battery.

Reference behaviors under test: SolrIndexer.fillMapFromProperties
(SolrIndexer.java:152-324), StanfordIndexer perRecordInit + custom methods
(StanfordIndexer.java:129-1410), PublicationUtils.getPubDateSliderVals
(PublicationUtils.java:271-384), and the default search handler's facet
battery (profiling/solr/conf/solrconfig.xml:64-280)."""

from __future__ import annotations

import os

import pytest

from marc_solr_profiling_spark.operators.fieldspec import MARC_SCHEMA
from marc_solr_profiling_spark.plans.profile import (
    ProfileField,
    parse_index_properties,
    profile_facets,
    profile_frame,
)

REF_SPEC = "/root/reference/profiling/prof_index.properties"


# ---------------------------------------------------------------------------
# parsing
# ---------------------------------------------------------------------------


def test_parse_basic_forms():
    text = """
# comment line
id = custom, getId
collection = customDeleteRecordIfFieldEmpty, getMusicRecords
building = custom, getBuildings, library_map.properties
f024_0a_sim = custom, get024(0, a)
f041_sim = custom, getAllAlphaSubfields(041)
leader_byte_06_si = 000[06]
f008_35-37_si = 008[35-37]
f7xxi_sim = 700i:710i:720i
f600abcdejq_sim = 600abcdejq
"""
    fields = parse_index_properties(text)
    by_name = {f.name: f for f in fields}
    assert len(fields) == 9
    assert by_name["id"].handler == "custom"
    assert by_name["id"].method == "getId"
    assert by_name["collection"].handler == "custom_delete_if_empty"
    assert by_name["building"].map_name == "library_map"
    assert by_name["f024_0a_sim"].args == ("0", "a")
    assert by_name["f041_sim"].args == ("041",)
    assert by_name["leader_byte_06_si"].handler == "spec"
    assert by_name["leader_byte_06_si"].spec_text == "000[06]"
    assert by_name["f7xxi_sim"].spec_text == "700i:710i:720i"


def test_parse_cardinality_suffixes():
    fields = parse_index_properties(
        "a_si = 100a\nb_sim = 100a\nc_ssi = 100a\nd_itsim = 100a\n"
        "format = custom, getFormats\nid = custom, getId\n"
    )
    multi = {f.name: f.multivalued for f in fields}
    assert multi == {
        "a_si": False, "b_sim": True, "c_ssi": False, "d_itsim": True,
        "format": True, "id": False,
    }


@pytest.mark.skipif(not os.path.exists(REF_SPEC), reason="reference absent")
def test_parse_real_prof_index_properties():
    fields = parse_index_properties(open(REF_SPEC).read())
    assert len(fields) == 211
    handlers = {f.handler for f in fields}
    assert handlers == {"spec", "custom", "custom_delete_if_empty"}
    # every custom method referenced by the real file has a dispatch entry
    from marc_solr_profiling_spark.plans.profile import _DISPATCH

    missing = {
        f.method for f in fields if f.handler != "spec"
    } - set(_DISPATCH)
    assert missing == set()


# ---------------------------------------------------------------------------
# compile fixtures
# ---------------------------------------------------------------------------


def _record(rid, leader, controls, datas):
    return (
        rid,
        leader,
        [{"tag": t, "data": d} for t, d in controls],
        [
            {
                "tag": t,
                "ind1": i1,
                "ind2": i2,
                "subfields": [{"code": c, "value": v} for c, v in sfs],
            }
            for t, i1, i2, sfs in datas
        ],
    )


def _item(callnum, scheme="LC", library="GREEN", home="STACKS",
          curr="STACKS", typ="STKS"):
    return ("999", " ", " ",
            [("a", callnum), ("w", scheme), ("m", library),
             ("l", home), ("k", curr), ("t", typ)])


MINI_SPEC = """
id = custom, getId
collection = customDeleteRecordIfFieldEmpty, getMusicRecords
format = custom, getFormats
building = custom, getBuildings, library_map.properties
language = custom, getLanguages, language_map.properties
pub_year_itsim = custom, getPubDateSliderVals
lc_alpha_facet = custom, getLCCallNumCats, callnumber_map.properties
lc_b4cutter_facet = custom, getLCCallNumsB4Cutter
leader_byte_06_si = 000[06]
f008_06_si = 008[6]
f024_1a_sim = custom, get024(1, a)
f041a_sim = 041a
f041_sim = custom, getAllAlphaSubfields(041)
f245a_ssi = 245a
"""


@pytest.fixture(scope="module")
def profiled(spark):
    rows = [
        # music score via format (leader 06 'c'), LC item at MUSIC
        _record(
            "r1", "00000ccm a2200000 a 4500",
            [("001", "a111"), ("008", " " * 35 + "eng" + " " * 2)],
            [
                ("245", "1", "0", [("a", "Sonata")]),
                _item("M5 .L6 1999", library="MUSIC"),
            ],
        ),
        # Book + M-class LC callnum -> music via the item path
        _record(
            "r2", "00000cam a2200000 a 4500",
            [("001", "a222"),
             ("008", "760629s1960" + " " * 24 + "fre  ")],
            [
                ("245", "1", "0", [("a", "Music theory")]),
                ("041", " ", " ", [("a", "engfre")]),
                _item("M23 .B3", library="GREEN"),
            ],
        ),
        # Book with non-M callnum -> NOT music (dropped by the gate)
        _record(
            "r3", "00000cam a2200000 a 4500",
            [("001", "a333"), ("008", " " * 38)],
            [
                ("245", "1", "0", [("a", "Calculus")]),
                _item("QA303 .B2 1879"),
            ],
        ),
        # music recording (leader 06 'j'), 024 ind1=1, LANE-MED excluded
        _record(
            "r4", "00000cjm a2200000 a 4500",
            [("001", "a444"),
             ("008", "850101d19801982" + " " * 20 + "ita  ")],
            [
                ("024", "1", " ", [("a", "UPC1"), ("z", "BAD1")]),
                ("024", "0", " ", [("a", "ISRC1")]),
                _item("M999 .X1", library="LANE-MED"),
            ],
        ),
    ]
    df = spark.createDataFrame(rows, MARC_SCHEMA)
    fields = parse_index_properties(MINI_SPEC)
    return profile_frame(df, fields, current_year=2026), fields


def _by_id(prof):
    return {r["id"]: r.asDict() for r in prof.collect()}


def test_gate_drops_non_music(spark, profiled):
    prof, _ = profiled
    ids = {r["id"] for r in prof.select("id").collect()}
    # r3 is a Book with a QA callnum -> getMusicRecords returns null ->
    # customDeleteRecordIfFieldEmpty drops the record entirely
    assert ids == {"111", "222", "444"}


def test_get_id_strips_leading_a(spark, profiled):
    prof, _ = profiled
    rows = _by_id(prof)
    assert set(rows) == {"111", "222", "444"}  # 'a' prefix stripped


def test_formats_and_collection(spark, profiled):
    rows = _by_id(profiled[0])
    assert rows["111"]["format"] == ["Music - Score"]
    assert rows["222"]["format"] == ["Book"]
    assert rows["444"]["format"] == ["Music - Recording"]
    assert all(r["collection"] == "music" for r in rows.values())


def test_buildings_remapped(spark, profiled):
    rows = _by_id(profiled[0])
    assert rows["111"]["building"] == ["Music"]
    assert rows["222"]["building"] == ["Green"]


def test_languages_smush_and_remap(spark, profiled):
    rows = _by_id(profiled[0])
    # 008/35-37 fre + 041a engfre split -> English, French (dedup'd)
    assert sorted(rows["222"]["language"]) == ["English", "French"]
    assert rows["111"]["language"] == ["English"]
    assert rows["444"]["language"] == ["Italian"]


def test_pub_date_slider(spark, profiled):
    rows = _by_id(profiled[0])
    # type 's': start year only
    assert rows["222"]["pub_year_itsim"] == ["1960"]
    # type 'd': start, end, and years between
    assert rows["444"]["pub_year_itsim"] == ["1980", "1981", "1982"]
    # blank 008 dates -> empty
    assert rows["111"]["pub_year_itsim"] == []


def test_lc_cats_and_b4cutter(spark, profiled):
    rows = _by_id(profiled[0])
    assert rows["111"]["lc_alpha_facet"] == ["M - Music"]
    assert rows["111"]["lc_b4cutter_facet"] == ["M5"]
    assert rows["222"]["lc_alpha_facet"] == ["M - Music"]
    assert rows["222"]["lc_b4cutter_facet"] == ["M23"]
    # LANE-MED items still contribute to lcCallnums (the LANE exclusion is
    # only in the music gate), M999 is valid LC
    assert rows["444"]["lc_alpha_facet"] == ["M - Music"]


def test_spec_fields_and_cardinality(spark, profiled):
    rows = _by_id(profiled[0])
    assert rows["111"]["leader_byte_06_si"] == "c"
    assert rows["222"]["f008_06_si"] == "s"
    assert rows["444"]["f024_1a_sim"] == ["UPC1"]  # ind1=0 row excluded
    assert rows["222"]["f041a_sim"] == ["engfre"]
    assert rows["222"]["f041_sim"] == ["engfre"]
    assert rows["111"]["f245a_ssi"] == "Sonata"  # _ssi -> scalar


def test_map_returning_method_expands_columns(spark, profiled):
    """Map-returning custom method (SolrIndexer.java:875-903): the spec
    line's own field name is a dummy; the returned map's keys name the
    output columns."""
    _, _fields = profiled
    rows_src = spark.createDataFrame(
        [
            _record("r2", "00000cam a2200000 a 4500",
                    [("001", "a222"),
                     ("008", "760629s1960" + " " * 24 + "fre  ")],
                    [("245", "1", "0", [("a", "Music theory")])]),
            _record("r4", "00000cjm a2200000 a 4500",
                    [("001", "a444"),
                     ("008", "850101d19801982" + " " * 20 + "ita  ")],
                    []),
        ],
        MARC_SCHEMA,
    )
    spec = "id = custom, getId\ndummy_name = custom, getPubDateData\n"
    prof = profile_frame(
        rows_src, parse_index_properties(spec), current_year=2026
    )
    # the dummy spec-line name is NOT an output column; the map keys are
    assert prof.columns == ["record_id", "id", "pub_year_itsim",
                            "pub_date_sort"]
    rows = {r["id"]: r.asDict() for r in prof.collect()}
    assert rows["222"]["pub_year_itsim"] == ["1960"]
    assert rows["222"]["pub_date_sort"] == "1960"
    assert rows["444"]["pub_year_itsim"] == ["1980", "1981", "1982"]
    assert rows["444"]["pub_date_sort"] == "1980"


def test_map_returning_method_delete_if_empty_gate(spark):
    """deleteIfEmpty + Map return: record dropped when the map is empty
    (SolrIndexer.java:882-883) — columnar analog: every emitted value
    empty/null."""
    rows_src = spark.createDataFrame(
        [
            _record("r1", "00000ccm a2200000 a 4500",
                    [("001", "a111"), ("008", " " * 38)], []),  # no dates
            _record("r2", "00000cam a2200000 a 4500",
                    [("001", "a222"),
                     ("008", "760629s1960" + " " * 24 + "fre  ")], []),
        ],
        MARC_SCHEMA,
    )
    spec = ("id = custom, getId\n"
            "dates = customDeleteRecordIfFieldEmpty, getPubDateData\n")
    prof = profile_frame(
        rows_src, parse_index_properties(spec), current_year=2026
    )
    ids = {r["id"] for r in prof.select("id").collect()}
    assert ids == {"222"}  # r1's slider set is empty -> dropped


def test_map_returning_method_user_registration(spark):
    """register_custom_method(returns_map=True): a user method emitting two
    columns at once, compiled into the wide frame."""
    from pyspark.sql import functions as F

    from marc_solr_profiling_spark.plans.profile import (
        _DISPATCH,
        field_column,
        register_custom_method,
    )

    def two_col(fld, ctx):
        lang = F.substring(
            F.try_element_at(
                F.filter("controlfields", lambda c: c["tag"] == "008")
                .getField("data"), F.lit(1)), 36, 3)
        return {"lang_008": lang,
                "lang_008_upper": F.upper(lang)}

    register_custom_method("getTwoCols", two_col, returns_map=True)
    try:
        rows_src = spark.createDataFrame(
            [_record("r2", "00000cam a2200000 a 4500",
                     [("001", "a222"),
                      ("008", "760629s1960" + " " * 24 + "fre  ")], [])],
            MARC_SCHEMA,
        )
        spec = "id = custom, getId\nx = custom, getTwoCols\n"
        fields = parse_index_properties(spec)
        prof = profile_frame(rows_src, fields, current_year=2026)
        row = prof.collect()[0]
        assert row["lang_008"] == "fre"
        assert row["lang_008_upper"] == "FRE"
        # the scalar compile path refuses map-returning methods loudly
        with pytest.raises(TypeError, match="returns a Map"):
            field_column(fields[1], {"current_year": 2026})
    finally:
        _DISPATCH.pop("getTwoCols", None)


def test_skipped_location_excludes_item(spark):
    # an item whose current location is on the skipped list never enters
    # the item set (Item.java:89-94) -> no buildings, no lcCallnums
    rows = [
        _record(
            "r9", "00000ccm a2200000 a 4500",
            [("001", "a999"), ("008", " " * 38)],
            [_item("M5 .L6", library="MUSIC", curr="DISCARD")],
        )
    ]
    df = spark.createDataFrame(rows, MARC_SCHEMA)
    fields = parse_index_properties(
        "id = custom, getId\nbuilding = custom, getBuildings\n"
        "lc_alpha_facet = custom, getLCCallNumCats\n"
    )
    prof = profile_frame(df, fields, current_year=2026)
    row = prof.collect()[0]
    assert row["building"] == []
    assert row["lc_alpha_facet"] == []


def test_ignored_callnum_excluded(spark):
    # XX-prefixed and INTERNET RESOURCE call numbers are ignored
    # (Item.java:123-128); invalid LC (starts with digit) fails isValidLC
    rows = [
        _record(
            "r8", "00000cam a2200000 a 4500",
            [("001", "a888"), ("008", " " * 38)],
            [
                _item("XX(12345.6)"),
                _item("INTERNET RESOURCE"),
                _item("12345 WEIRD"),
                _item("PN1998 .S5"),
            ],
        )
    ]
    df = spark.createDataFrame(rows, MARC_SCHEMA)
    fields = parse_index_properties(
        "id = custom, getId\n"
        "lc_b4cutter_facet = custom, getLCCallNumsB4Cutter\n"
    )
    prof = profile_frame(df, fields, current_year=2026)
    assert prof.collect()[0]["lc_b4cutter_facet"] == ["PN1998"]


@pytest.mark.skipif(not os.path.exists(REF_SPEC), reason="reference absent")
def test_full_real_spec_compiles_and_runs(spark):
    """The entire 211-field reference spec compiles into one projection and
    evaluates without error."""
    fields = parse_index_properties(open(REF_SPEC).read())
    rows = [
        _record(
            "r1", "00000ccm a2200000 a 4500",
            [("001", "a111"), ("008", "760629s1960" + " " * 24 + "eng  ")],
            [
                ("245", "1", "0", [("a", "Sonata"), ("c", "by X")]),
                ("650", " ", "0", [("a", "Music"), ("v", "Congresses.")]),
                _item("M5 .L6 1999", library="MUSIC"),
            ],
        )
    ]
    df = spark.createDataFrame(rows, MARC_SCHEMA)
    prof = profile_frame(df, fields, current_year=2026)
    assert len(prof.columns) == 212  # record_id + 211 spec fields
    out = prof.collect()
    assert len(out) == 1
    assert out[0]["id"] == "111"
    assert out[0]["f245a_ssi"] == "Sonata"
    assert out[0]["f650v_sim"] == ["Congresses."]


# ---------------------------------------------------------------------------
# facet battery
# ---------------------------------------------------------------------------


def test_profile_facets_one_pass(spark, profiled):
    prof, _ = profiled
    fac = profile_facets(
        prof, ["format", "building", "language", "f041a_sim"]
    )
    got = {
        (r["facet_field"], r["facet_value"]): (r["count"], r["rank"])
        for r in fac.collect()
    }
    assert got[("format", "Book")] == (1, 1)
    assert got[("format", "Music - Recording")] == (1, 2)
    assert got[("format", "Music - Score")] == (1, 3)
    assert got[("building", "Music")][0] == 1
    assert got[("building", "Green")][0] == 1
    assert got[("language", "English")][0] == 2
    # ties broken by value ascending
    fmt_ranks = [
        r["facet_value"]
        for r in fac.collect()
        if r["facet_field"] == "format"
    ]
    assert fmt_ranks == sorted(fmt_ranks)


def test_profile_facets_limit_and_mincount(spark, profiled):
    prof, _ = profiled
    fac = profile_facets(prof, ["language"], limit=1)
    rows = fac.collect()
    assert len(rows) == 1
    assert rows[0]["facet_value"] == "English"  # count 2 beats the rest
    fac2 = profile_facets(prof, ["language"], mincount=2)
    assert [r["facet_value"] for r in fac2.collect()] == ["English"]


def test_profile_facets_single_shuffle_plan(spark, profiled):
    """The battery must be ONE explode + ONE aggregation exchange (+ the
    window on the counted side), not one scan per field."""
    prof, _ = profiled
    fac = profile_facets(prof, ["format", "building", "language"])
    plan = fac._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate explode") == 1
