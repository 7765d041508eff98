"""Mapping-test tier for the field-spec DSL and domain functions — the
analog of the reference's SolrFieldMappingTest harness
(core/test/src/org/solrmarc/testUtils/SolrFieldMappingTest.java:61-123:
build a synthetic record, run only the extraction, assert values)."""

import pytest
from pyspark.sql import functions as F

from marc_solr_profiling_spark.functions.domain import (
    era_expr, expand_era, format_expr, is_mhld_expr, sortable_title_expr,
    split_lang_codes_expr, url_class_expr,
)
from marc_solr_profiling_spark.operators.fieldspec import (
    MARC_SCHEMA, all_alpha_subfields_expr, all_searchable_expr,
    field_list_expr, first_field_expr, include_if_missing,
    include_if_present, parse_spec, remove_fields_expr,
)


def _rec(record_id="u1", leader="01234cam a2200000 a 4500",
         control=None, data=None):
    return (record_id, leader, control or [], data or [])


@pytest.fixture(scope="module")
def marc_df(spark):
    rows = [
        _rec(
            "u1",
            control=[("001", "u1"), ("008", "920403s1992    caua     b    000 0 eng  ")],
            data=[
                ("245", "1", "4", [("a", "The title"), ("b", "a subtitle"),
                                   ("c", "by Someone")]),
                ("100", "1", " ", [("a", "Author, Ann"), ("d", "1950-")]),
                ("650", " ", "0", [("a", "Cats"), ("x", "History")]),
                ("650", " ", "0", [("a", "Dogs")]),
                ("880", "1", " ", [("6", "245-01"), ("a", "标题"), ("b", "副标题")]),
                ("999", " ", " ", [("a", "QA76.73 .S67")]),
            ],
        ),
        _rec(
            "u2",
            leader="01234cuas2200000 a 4500",  # leader byte 06 (0-based) = u -> MHLD
            control=[("001", "u2"), ("008", "750727c19589999enkqr p       0   a0eng  ")],
            data=[
                ("245", "0", "0", [("a", "Serial title")]),
                ("041", " ", " ", [("a", "engfreger")]),
                ("045", " ", " ", [("a", "a9b3")]),
                ("856", "4", "2", [("u", "http://x"), ("z", "Table of contents only")]),
                ("856", "4", "0", [("u", "http://y"), ("z", "full view")]),
            ],
        ),
    ]
    return spark.createDataFrame(rows, MARC_SCHEMA)


def test_parse_spec_families():
    specs = parse_spec("245ab:008[35-37]:100[a-cf-z]:LNK245ab:000[6]")
    assert [s.tag for s in specs] == ["245", "008", "100", "245", "000"]
    assert specs[1].byte_range == (35, 37)
    assert specs[2].codes == "a-cf-z"
    assert specs[3].linked
    assert specs[4].byte_range == (6, 6)


def _one(df, col, rid="u1"):
    return df.filter(F.col("record_id") == rid).select(col.alias("v")).first()["v"]


def test_subfield_select_concat(marc_df):
    assert _one(marc_df, field_list_expr("245ab")) == ["The title a subtitle"]
    # repeatable tags: one value per field instance, ordered
    assert _one(marc_df, field_list_expr("650a")) == ["Cats", "Dogs"]
    # custom separator (MarcUtils.java:1300-1309)
    assert _one(marc_df, field_list_expr("245ab'--'")) == ["The title--a subtitle"]


def test_colon_union_dedup(marc_df):
    # union across pieces, LinkedHashSet order
    assert _one(marc_df, field_list_expr("650a:245a")) == [
        "Cats", "Dogs", "The title"
    ]
    # dedup across pieces
    assert _one(marc_df, field_list_expr("650a:650a")) == ["Cats", "Dogs"]


def test_control_byte_range_and_leader(marc_df):
    # 008[35-37] = language (MarcUtils.java:699-754)
    assert _one(marc_df, field_list_expr("008[35-37]")) == ["eng"]
    # leader via pseudo-tag 000 (MarcUtils.java:655-660); byte 06 = type
    assert _one(marc_df, field_list_expr("000[6]")) == ["a"]
    assert _one(marc_df, field_list_expr("000[6]"), "u2") == ["u"]


def test_subfield_char_class(marc_df):
    # 100[a-cf-z]: includes a..c and f..z -> excludes d (the date)
    assert _one(marc_df, field_list_expr("100[a-cf-z]")) == ["Author, Ann"]


def test_linked_880(marc_df):
    assert _one(marc_df, field_list_expr("LNK245ab")) == ["标题 副标题"]


def test_first_and_alpha_modes(marc_df):
    assert _one(marc_df, first_field_expr("650a")) == "Cats"
    assert _one(marc_df, all_alpha_subfields_expr("650", "all")) == [
        "Cats History", "Dogs"
    ]
    assert _one(marc_df, all_alpha_subfields_expr("650", "first")) == "Cats History"
    assert _one(marc_df, all_alpha_subfields_expr("650", "join")) == "Cats History Dogs"


def test_all_searchable_range(marc_df):
    got = _one(marc_df, all_searchable_expr(100, 900))
    assert got.startswith("The title a subtitle by Someone Author, Ann")
    assert "QA76.73" not in got  # 999 outside [100, 900)
    assert "标题" in got  # 880 inside range


def test_remove_fields_and_gates(marc_df):
    kept = _one(marc_df, F.transform(remove_fields_expr("^(650|880)$"),
                                     lambda f: f["tag"]))
    assert kept == ["245", "100", "999"]
    assert include_if_present(marc_df, "041a").count() == 1
    assert include_if_present(marc_df, "650a", contains="^Cat").count() == 1
    assert include_if_missing(marc_df, "041a").count() == 1


def test_format_and_mhld(marc_df):
    got = {
        r["record_id"]: (r["fmt"], r["mhld"])
        for r in marc_df.select(
            "record_id",
            format_expr().alias("fmt"),
            is_mhld_expr().alias("mhld"),
        ).collect()
    }
    assert got["u1"] == ("Book", False)   # type=a, level=m
    assert got["u2"][1] is True           # leader/06=u


def test_era_expansion(spark):
    assert expand_era("d6") == ["d6"]
    assert expand_era("a9b3") == ["a9", "b0", "b1", "b2", "b3"]
    assert expand_era("b3a9") == []
    assert expand_era("zz") == []
    df = spark.createDataFrame(
        [("d6",), ("a9b3",), ("b3a9",), ("junk",)], "era string"
    )
    got = [r["e"] for r in df.select(era_expr("era").alias("e")).collect()]
    assert got == [["d6"], ["a9", "b0", "b1", "b2", "b3"], [], []]


def test_url_class(spark):
    df = spark.createDataFrame(
        [("0", "full view"), ("2", "extra"), ("1", "Table of Contents"),
         (" ", None)],
        "ind2 string, note string",
    )
    got = [r["c"] for r in df.select(url_class_expr("ind2", "note").alias("c")).collect()]
    assert got == ["fulltext", "supplemental", "supplemental", "unknown"]


def test_sortable_title_and_lang_split(spark):
    df = spark.createDataFrame(
        [("The title", "4"), ("A tale", "2"), ("Plain", " ")],
        "title string, ind2 string",
    )
    got = [r["s"] for r in df.select(
        sortable_title_expr("title", "ind2").alias("s")).collect()]
    assert got == ["title", "tale", "plain"]
    df2 = spark.createDataFrame([("engfreger",), ("en",), ("",)],
                                "langs string")
    got2 = [r["l"] for r in df2.select(
        split_lang_codes_expr("langs").alias("l")).collect()]
    # empty 041a emits NOTHING (not two phantom '' codes from the
    # descending sequence(0,-1) corner)
    assert got2 == [["eng", "fre", "ger"], ["en"], []]


def test_all_alpha_except(marc_df):
    from marc_solr_profiling_spark.operators.fieldspec import (
        all_alpha_except_expr,
    )

    rows = {r["record_id"]: r["v"] for r in marc_df.select(
        "record_id", all_alpha_except_expr("650x").alias("v")).collect()}
    # taboo 'x' drops History; both 650s emit their remaining alpha values
    assert rows["u1"] == ["Cats", "Dogs"]
    assert rows["u2"] == []
    rows2 = {r["record_id"]: r["v"] for r in marc_df.select(
        "record_id", all_alpha_except_expr("245c:100d").alias("v")).collect()}
    # 245 minus $c, then 100 minus $d — colon union, ordered
    assert rows2["u1"] == ["The title a subtitle", "Author, Ann"]


def test_delete_subfields(marc_df):
    from marc_solr_profiling_spark.operators.fieldspec import (
        delete_subfields_expr, field_list_expr,
    )

    stripped = marc_df.withColumn(
        "datafields", delete_subfields_expr("245", "bc")
    )
    rows = {r["record_id"]: r["v"] for r in stripped.select(
        "record_id", field_list_expr("245abc").alias("v")).collect()}
    assert rows["u1"] == ["The title"]       # $b/$c gone
    assert rows["u2"] == ["Serial title"]
    # other tags untouched
    rows2 = {r["record_id"]: r["v"] for r in stripped.select(
        "record_id", field_list_expr("650ax").alias("v")).collect()}
    assert rows2["u1"] == ["Cats History", "Dogs"]


def test_longest_value_pick(marc_df):
    from marc_solr_profiling_spark.operators.fieldspec import (
        longest_value_expr,
    )

    rows = {r["record_id"]: r["v"] for r in marc_df.select(
        "record_id", longest_value_expr("650a").alias("v")).collect()}
    assert rows["u1"] == "Cats"  # 'Cats' ties beat nothing; longest of Cats/Dogs = first longest (equal length -> first)
    rows2 = {r["record_id"]: r["v"] for r in marc_df.select(
        "record_id", longest_value_expr("245b:245a").alias("v")).collect()}
    assert rows2["u1"] == "a subtitle"
    assert rows2["u2"] == "Serial title"
    assert {r["record_id"]: r["v"] for r in marc_df.select(
        "record_id", longest_value_expr("260a").alias("v")).collect()}["u1"] is None


def test_combined_orig_vernacular(marc_df):
    from marc_solr_profiling_spark.operators.fieldspec import (
        combined_orig_vernacular_expr,
    )

    rows = {r["record_id"]: r["v"] for r in marc_df.select(
        "record_id", combined_orig_vernacular_expr("245ab").alias("v")
    ).collect()}
    # original then vernacular parallel (880 $6=245-01), LinkedHashSet order
    assert rows["u1"] == ["The title a subtitle", "标题 副标题"]
    assert rows["u2"] == ["Serial title"]


def test_stanford_all_fields_keepers(marc_df):
    from marc_solr_profiling_spark.operators.fieldspec import (
        stanford_all_fields_expr,
    )

    rows = {r["record_id"]: r["v"] for r in marc_df.select(
        "record_id",
        stanford_all_fields_expr(lo=100, hi=900).alias("v")).collect()}
    # u1: 100-899 range covers 245/100/650/880 but NOT 999 (not a keeper)
    assert "QA76.73" not in rows["u1"]
    assert "The title" in rows["u1"] and "Cats" in rows["u1"]
    # with 999 added as keeper the call-number joins the searchable text
    rows2 = {r["record_id"]: r["v"] for r in marc_df.select(
        "record_id",
        stanford_all_fields_expr(lo=100, hi=900,
                                 keepers=("999",)).alias("v")).collect()}
    assert "QA76.73" in rows2["u1"]


def test_indicator_filtered_024(spark):
    from marc_solr_profiling_spark.operators.fieldspec import (
        MARC_SCHEMA, indicator_filtered_values_expr,
    )

    rows = [("u5", "ldr", [], [
        ("024", "0", " ", [("a", "123456789012")]),   # ISRC (ind1=0)
        ("024", "1", " ", [("a", "036000291452")]),   # UPC (ind1=1)
        ("024", "1", " ", [("a", "036000291452")]),   # duplicate
        ("024", "2", " ", [("a", "M-2306-7118-7")]),  # ISMN (ind1=2)
        ("024", "1", " ", [("z", "badvalue"), ("a", "")]),
    ])]
    df = spark.createDataFrame(rows, MARC_SCHEMA)
    got = df.select(
        indicator_filtered_values_expr("024", "1", "a").alias("v")).first()["v"]
    assert got == ["036000291452"]  # ind1=1, $a only, deduped, no empties
    got0 = df.select(
        indicator_filtered_values_expr("024", "0", "a").alias("v")).first()["v"]
    assert got0 == ["123456789012"]


def test_music_collection_gate(spark):
    from marc_solr_profiling_spark.functions.domain import (
        music_collection_expr,
    )

    df = spark.createDataFrame(
        [("Music - Score", []),
         ("Sound Recording", None),
         ("Book", ["M5 .L3 V.188"]),       # LC class M -> music
         ("Book", ["ML410 .B1"]),          # ML != M -> not music
         ("Book", ["QA76.73 .S67"]),
         ("Video", ["M5 .L3"])],           # non-book format w/ M callnum
        "fmt string, callnums array<string>",
    )
    got = [r["c"] for r in df.select(
        music_collection_expr("fmt", "callnums").alias("c")).collect()]
    assert got == ["music", "music", "music", None, None, None]


# --- getAllSubfields with full subfield-code regexes -----------------------
# (MarcUtils.java:541-585: the code part of each spec piece is an arbitrary
# regex fully matched against the one-char code)


def test_all_subfields_plain_codes(marc_df):
    from marc_solr_profiling_spark.operators.fieldspec import all_subfields_expr

    # a single code is a valid one-char regex
    assert _one(marc_df, all_subfields_expr("245a")) == ["The title"]
    # reference quirk preserved: "ab" is a TWO-char regex that can never
    # fully match a one-char code, so it selects nothing — multi-code
    # specs must use bracket syntax (MarcUtils.java:583 matches())
    assert _one(marc_df, all_subfields_expr("245ab")) == []
    assert _one(marc_df, all_subfields_expr("245[ab]")) == [
        "The title a subtitle"
    ]


def test_all_subfields_char_class(marc_df):
    from marc_solr_profiling_spark.operators.fieldspec import all_subfields_expr

    # bracket pattern with ranges and exception
    assert _one(marc_df, all_subfields_expr("245[a-c]")) == [
        "The title a subtitle by Someone"
    ]
    assert _one(marc_df, all_subfields_expr("650[^x]")) == ["Cats", "Dogs"]


def test_all_subfields_alternation(marc_df):
    from marc_solr_profiling_spark.operators.fieldspec import all_subfields_expr

    assert _one(marc_df, all_subfields_expr("245(a|c)")) == [
        "The title by Someone"
    ]
    # alternation without parens
    assert _one(marc_df, all_subfields_expr("650a|x")) == [
        "Cats History",
        "Dogs",
    ]


def test_all_subfields_empty_spec_means_all(marc_df):
    from marc_solr_profiling_spark.operators.fieldspec import all_subfields_expr

    assert _one(marc_df, all_subfields_expr("650")) == ["Cats History", "Dogs"]


def test_all_subfields_separator_and_clean(marc_df):
    from marc_solr_profiling_spark.operators.fieldspec import all_subfields_expr

    assert _one(marc_df, all_subfields_expr("245[ab]", separator="--")) == [
        "The title--a subtitle"
    ]
    # trailing-punct subfield value is cleaned (Utils.cleanData applied to
    # each per-field value)
    assert _one(marc_df, all_subfields_expr("100a")) == ["Author, Ann"]


def test_all_subfields_multi_piece_set_dedup(marc_df):
    from marc_solr_profiling_spark.operators.fieldspec import all_subfields_expr

    # duplicate pieces collapse via LinkedHashSet semantics
    assert _one(marc_df, all_subfields_expr("650a:650a")) == ["Cats", "Dogs"]


def test_codes_matching_regex():
    from marc_solr_profiling_spark.operators.fieldspec import (
        codes_matching_regex,
    )

    assert codes_matching_regex("[a-c]") == ["a", "b", "c"]
    assert codes_matching_regex("a|z") == ["a", "z"]
    assert "x" not in codes_matching_regex("[^x0-9]")
    assert len(codes_matching_regex("")) == len(
        codes_matching_regex(".")
    )
