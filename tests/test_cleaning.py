"""Unit tests for the cleaning scalar layer (the analog of the reference's
UtilUnitTests / DateUtilsTests / StringNaturalCompareTest tier)."""

import pytest

from marc_solr_profiling_spark.functions.cleaning import (
    clean_data,
    natural_sort_key,
)


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("word.", "word"),
        ("word,", "word"),
        ("word /", "word"),
        ("word ;", "word"),
        ("word :", "word"),
        ("[bracketed]", "bracketed"),
        ("[unmatched", "unmatched"),
        ("unmatched]", "unmatched"),
        ("has [inner] brackets", "has [inner] brackets"),
        ("A.", "A."),              # single letter before period -> keep
        ("ab.", "ab"),             # two letters before period -> strip
        ("word. ,/", "word"),      # fixpoint: multiple passes
        ("  spaced  ", "spaced"),
        ("", ""),
        (None, None),
    ],
)
def test_clean_data(raw, expected):
    assert clean_data(raw) == expected


def test_natural_sort_key_orders_numbers():
    vals = ["u99", "u100", "u9", "u1000"]
    ordered = sorted(vals, key=natural_sort_key)
    assert ordered == ["u9", "u99", "u100", "u1000"]
    assert natural_sort_key(None) is None
    assert natural_sort_key("abc") == "abc"


def test_spark_exprs(spark):
    from pyspark.sql import functions as F

    from marc_solr_profiling_spark.functions.cleaning import (
        extract_year_expr,
        isbn_valid_expr,
        trim_near_duplicates_expr,
    )

    df = spark.createDataFrame(
        [
            ("published 1984.", "0131103628", ["New York", "New York City", "Boston"]),
            ("c198?", "9780306406157", ["a"]),
            ("[2001]", "0131103629", []),
            ("19--", "12345", ["x", "xy", "xyz"]),
            ("no year here", "", ["dup", "dup"]),
            ("i.e. 1999 (not 1998)", "020161622X", ["k"]),
        ],
        "note string, isbn string, names array<string>",
    )
    rows = df.select(
        extract_year_expr("note").alias("year"),
        isbn_valid_expr("isbn").alias("valid"),
        trim_near_duplicates_expr("names").alias("trimmed"),
    ).collect()
    assert [r["year"] for r in rows] == [1984, 1980, 2001, 1900, None, 1999]
    assert [r["valid"] for r in rows] == [True, True, False, False, False, True]
    assert rows[0]["trimmed"] == ["New York City", "Boston"]
    assert rows[3]["trimmed"] == ["xyz"]
    assert rows[4]["trimmed"] == ["dup"]  # set semantics: dedupe first
