"""Translation-map tests — the maintest.txt translation-map tier."""

from pyspark.sql import functions as F

from marc_solr_profiling_spark.functions.remap import (
    load_properties_map, pattern_map_expr, remap_expr, remap_multi_expr,
    split_pattern_rules,
)

LANG_MAP = {"eng": "English", "fre": "French", "__DEFAULT": "Other"}


def test_remap_plain_and_default(spark):
    df = spark.createDataFrame([("eng",), ("fre",), ("xxx",), (None,)], "v string")
    got = [r["m"] for r in df.select(remap_expr("v", LANG_MAP).alias("m")).collect()]
    assert got == ["English", "French", "Other", "Other"]


def test_remap_display_raw_and_drop(spark):
    df = spark.createDataFrame([("eng",), ("xxx",)], "v string")
    raw = [r["m"] for r in df.select(
        remap_expr("v", {"eng": "English"}, display_raw_if_missing=True).alias("m")
    ).collect()]
    assert raw == ["English", "xxx"]
    drop = [r["m"] for r in df.select(
        remap_expr("v", {"eng": "English"}).alias("m")).collect()]
    assert drop == ["English", None]


def test_remap_multi_dedup(spark):
    df = spark.createDataFrame([(["eng", "fre", "zzz", "eng"],)], "v array<string>")
    got = df.select(remap_multi_expr("v", {"eng": "E", "fre": "F"}).alias("m")).first()["m"]
    assert got == ["E", "F"]  # unmapped dropped, duplicates collapsed


def test_pattern_map_first_match_and_backref(spark):
    rules = [(r"^(\d{4})-\d{4}$", "$1"), (r"^(\d{4})$", "$1"), (r"^.*$", "unknown")]
    df = spark.createDataFrame([("1990-1999",), ("2001",), ("junk",)], "v string")
    got = [r["m"] for r in df.select(
        pattern_map_expr("v", rules).alias("m")).collect()]
    assert got == ["1990", "2001", "unknown"]


def test_pattern_map_cumulative(spark):
    rules = [(r"\s+", " "), (r"^ | $", "")]
    df = spark.createDataFrame([("  a   b  ",)], "v string")
    got = df.select(
        pattern_map_expr("v", rules, first_match_wins=False).alias("m")
    ).first()["m"]
    assert got == "a b"


def test_load_properties_and_pattern_split():
    props = load_properties_map(
        "# comment\n"
        "eng = English\n"
        "pattern_1 = ^(\\d{4}).*=>$1\n"
        "pattern_0 = ^n/a$=>\n"
        "__DEFAULT = Other\n"
    )
    assert props["eng"] == "English"
    rules = split_pattern_rules(props)
    assert rules[0][0] == "^n/a$" and rules[1][1] == "$1"


def test_translation_data_maps_ported():
    """The 19 reference translation maps ship as package data
    (profiling/translation_maps/ + core/translation_maps/, SURVEY.md
    §2.9) wired through the remap engine."""
    from marc_solr_profiling_spark.functions.translation_data import (
        TRANSLATION_MAPS,
    )

    assert len(TRANSLATION_MAPS) == 19
    lang = TRANSLATION_MAPS["core/language_map"]
    assert lang["eng"] == "English"
    assert lang["fre"] == "French"
    assert lang["???"] is None  # the reference's explicit null mapping
    # LC class captions (callnumber_map): hierarchical 'A|B' values
    cn = TRANSLATION_MAPS["core/callnumber_map"]
    assert cn["A"].startswith("General")
    # list-form maps are membership sets
    skipped = TRANSLATION_MAPS["profiling/locations_skipped_list"]
    assert "DISCARD" in skipped and isinstance(skipped, frozenset)


def test_remap_with_real_language_map(spark):
    from pyspark.sql import functions as F

    from marc_solr_profiling_spark.functions.remap import remap_expr
    from marc_solr_profiling_spark.functions.translation_data import (
        TRANSLATION_MAPS,
    )

    m = {k: v for k, v in TRANSLATION_MAPS["core/language_map"].items()
         if v is not None}
    df = spark.createDataFrame(
        [("eng",), ("ger",), ("xxx",)], "code string"
    )
    got = [r["v"] for r in df.select(
        remap_expr("code", m).alias("v")).collect()]
    assert got == ["English", "German", None]
