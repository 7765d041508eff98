"""Mapping-test tier for the domain classification/sort functions —
mirrors profiling/test/src/edu/stanford/LeaderByteTests.java:40-52 (build
a record with known leader bytes, assert the classified value) and the
PublicationUtils / getSortableAuthor unit shapes."""

from pyspark.sql import functions as F

from marc_solr_profiling_spark.functions.domain import (
    MISSING_AUTHOR_SENTINEL, author_title_key_expr, format_full_expr,
    pub_date_display_expr, pub_date_groups_expr, pub_date_sort_expr,
    sortable_author_expr,
)

CUR = 2026


def _classify(spark, rows):
    df = spark.createDataFrame(
        rows, "leader string, f008 string, f006 string, has_502 boolean,"
              " title_h string",
    )
    return [
        r["fmt"]
        for r in df.select(
            format_full_expr("leader", "f008", "f006", "has_502",
                             "title_h").alias("fmt")
        ).collect()
    ]


def _ldr(b06, b07):
    return "00000" + " " + b06 + b07 + " " * 16


def test_format_full_leader_switch(spark):
    blank008 = " " * 40
    rows = [
        (_ldr("a", "m"), blank008, None, False, None),   # Book
        (_ldr("t", "a"), blank008, None, False, None),   # Book
        (_ldr("b", "m"), blank008, None, False, None),   # Manuscript
        (_ldr("c", "m"), blank008, None, False, None),   # Score
        (_ldr("e", "m"), blank008, None, False, None),   # Map
        (_ldr("j", "m"), blank008, None, False, None),   # Music rec
        (_ldr("i", "m"), blank008, None, False, None),   # Sound rec
    ]
    assert _classify(spark, rows) == [
        "Book", "Book", "Manuscript/Archive", "Music - Score", "Map/Globe",
        "Music - Recording", "Sound Recording",
    ]


def test_format_full_008_byte_gates(spark):
    v008 = " " * 33 + "v" + " " * 6    # 008/33 = v
    m008 = " " * 33 + "m" + " " * 6
    x008 = " " * 33 + "x" + " " * 6
    i008 = " " * 33 + "i" + " " * 6
    a26 = " " * 26 + "a" + " " * 13    # 008/26 = a
    rows = [
        (_ldr("g", "m"), v008, None, False, None),  # Video (008/33 v)
        (_ldr("g", "m"), m008, None, False, None),  # Video (008/33 m)
        (_ldr("g", "m"), x008, None, False, None),  # NOT video -> Other
        (_ldr("k", "m"), i008, None, False, None),  # Image (008/33 i)
        (_ldr("k", "m"), x008, None, False, None),  # not image
        (_ldr("m", "m"), a26, None, False, None),   # ComputerFile (008/26 a)
        (_ldr("m", "m"), x008, None, False, None),  # not computer file
    ]
    assert _classify(spark, rows) == [
        "Video", "Video", "Other", "Image", "Other", "Computer File",
        "Other",
    ]


def test_format_full_serial_and_006_fallback(spark):
    def ser008(c21):
        return " " * 21 + c21 + " " * 18

    rows = [
        (_ldr("a", "s"), ser008("p"), None, False, None),  # Journal
        (_ldr("a", "s"), ser008("n"), None, False, None),  # Newspaper
        (_ldr("a", "s"), ser008("m"), None, False, None),  # monographic ser
        (_ldr("a", "s"), ser008(" "), None, False, None),  # blank -> Journal
        # 006 fallback: leader says nothing serial but 006/00=s, 006/04=n
        (_ldr("a", "m"), " " * 40, "s   n  ", False, None),
    ]
    assert _classify(spark, rows) == [
        "Journal/Periodical", "Newspaper", "Book", "Journal/Periodical",
        "Newspaper",
    ]


def test_format_full_thesis_and_microformat_override(spark):
    rows = [
        (_ldr("a", "m"), " " * 40, None, True, None),          # 502 -> Thesis
        (_ldr("a", "m"), " " * 40, None, False, "[microform]"),
        (_ldr("a", "m"), " " * 40, None, True, "[microform]"),  # micro wins
    ]
    assert _classify(spark, rows) == ["Thesis", "Microformat", "Microformat"]


def test_sortable_author_missing_sorts_last(spark):
    df = spark.createDataFrame(
        [("Smith, Jane", "some title"), (None, "another title"),
         ("", "empty author title")],
        "author string, tsort string",
    )
    rows = df.select(
        sortable_author_expr("author", "tsort").alias("k")
    ).collect()
    keys = [r["k"] for r in rows]
    assert keys[0] == "smith, jane some title"
    # MAX_CODE_POINT head: missing-author keys sort after any real name
    assert keys[1].startswith(MISSING_AUTHOR_SENTINEL.lower().strip("\x20"))
    assert sorted(keys) == [keys[0], keys[1], keys[2]] or sorted(keys)[0] == keys[0]
    assert max(keys) in (keys[1], keys[2])
    assert min(keys) == keys[0]


def test_author_title_key(spark):
    df = spark.createDataFrame(
        [("Smith, Jane", "Uniform title", "Title proper"),
         ("Smith, Jane", None, "Title proper"),
         ("Smith, Jane", "  ", "Title proper"),
         (None, "Uniform title", "Title proper")],
        "author string, t240 string, t245 string",
    )
    got = [
        r["k"]
        for r in df.select(
            author_title_key_expr("author", "t240", "t245").alias("k")
        ).collect()
    ]
    assert got == [
        "Smith, Jane Uniform title",   # 240 wins when present
        "Smith, Jane Title proper",    # falls back to 245
        "Smith, Jane Title proper",    # blank 240 = missing
        None,                          # no author -> no key
    ]


def test_pub_date_imputation_and_sort(spark):
    df = spark.createDataFrame(
        [("1992",), ("196u",), ("19uu",), ("uuuu",), ("9999",), ("0450",)],
        "d string",
    )
    disp = [
        r["v"] for r in df.select(
            pub_date_display_expr("d", CUR).alias("v")).collect()
    ]
    # sanity window: 9999 (> current+1) and 0450 (< 500) are rejected
    assert disp == ["1992", "1960s", "20th century", None, None, None]
    srt = [
        r["v"] for r in df.select(
            pub_date_sort_expr("d", CUR).alias("v")).collect()
    ]
    assert srt == ["1992", "196-", "19--", None, None, None]
    # hyphens sort before digits: 196- shelves before 1960
    assert "196-" < "1960"


def test_pub_date_groups(spark):
    df = spark.createDataFrame(
        [(CUR,), (CUR - 2,), (CUR - 7,), (CUR - 30,), (CUR - 200,), (None,)],
        "y int",
    )
    got = [
        r["g"] for r in df.select(
            pub_date_groups_expr("y", CUR).alias("g")).collect()
    ]
    assert got[0] == ["This year", "Last 3 years", "Last 10 years",
                      "Last 50 years"]
    assert got[1] == ["Last 3 years", "Last 10 years", "Last 50 years"]
    assert got[2] == ["Last 10 years", "Last 50 years"]
    assert got[3] == ["Last 50 years"]
    assert got[4] == ["More than 50 years ago"]
    assert got[5] == []
