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
