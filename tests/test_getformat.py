"""GetFormatMixin content/media taxonomy (GetFormatMixin.java:210-2078) —
mapping-test tier in the reference's style (build a synthetic record,
assert the derived types)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from marc_solr_profiling_spark.functions.getformat import (
    add_online_types_expr,
    content_and_media_types_expr,
    content_types_expr,
    has_full_text_expr,
    is_archive_expr,
    media_types_expr,
    primary_content_type_expr,
)


def _pad(prefix: str, ch: str, pos: int, total: int = 40) -> str:
    """Fixed field with ``ch`` at 0-based ``pos``."""
    s = prefix + " " * (pos - len(prefix)) + ch
    return s + " " * (total - len(s))


def _leader(b06: str, b07: str = "m", b08: str = " ") -> str:
    return "00000 " + b06 + b07 + b08 + " " * 15


def _content(spark, leader, f008=None, f006s=None, has_502=False,
             has_020=False):
    df = spark.createDataFrame(
        [(leader, f008, f006s, has_502, has_020)],
        "leader string, f008 string, f006s array<string>,"
        " has_502 boolean, has_020 boolean",
    )
    return df.select(
        content_types_expr(
            has_502="has_502", has_020="has_020"
        ).alias("t")
    ).collect()[0]["t"]


def _media(spark, leader="00000 am  " + " " * 14, f008=None, f006s=None,
           f007s=None, title_h=None):
    df = spark.createDataFrame(
        [(leader, f008, f006s, f007s, title_h)],
        "leader string, f008 string, f006s array<string>,"
        " f007s array<string>, title_h string",
    )
    return df.select(
        media_types_expr(title_h="title_h").alias("t")
    ).collect()[0]["t"]


# -- content types ----------------------------------------------------------

def test_book_monograph(spark):
    assert _content(spark, _leader("a", "m"), _pad("", " ", 39)) == ["Book"]


def test_leader07_variants(spark):
    assert _content(spark, _leader("a", "c"), _pad("", " ", 39)) == [
        "BookCollection"
    ]
    # serial profile refines via 008/21
    assert _content(spark, _leader("a", "s"), _pad("", "n", 21)) == [
        "Newspaper"
    ]
    assert _content(spark, _leader("a", "s"), _pad("", "w", 21)) == [
        "Website"
    ]
    # unknown 008/21 code falls back to the leader type
    assert _content(spark, _leader("a", "s"), _pad("", "z", 21)) == [
        "Serial"
    ]


def test_computer_file_refinements(spark):
    assert _content(spark, _leader("m"), _pad("", "g", 26)) == [
        "ComputerGame"
    ]
    assert _content(spark, _leader("m"), _pad("", "j", 26)) == [
        "ComputerOnlineSystem"
    ]
    # 008 too short for position 26 -> default type + "minor error"
    assert _content(spark, _leader("m"), "0123456789") == ["ComputerFile"]


def test_map_refinements(spark):
    assert _content(spark, _leader("e"), _pad("", "e", 25)) == ["Atlas"]
    assert _content(spark, _leader("e"), _pad("", "d", 25)) == ["Globe"]
    assert _content(spark, _leader("e"), _pad("", "z", 25)) == ["Map"]


def test_visual_refinements(spark):
    assert _content(spark, _leader("g"), _pad("", "v", 33)) == ["Video"]
    assert _content(spark, _leader("k"), _pad("", "w", 33)) == ["Toy"]
    assert _content(spark, _leader("r"), _pad("", "r", 33)) == ["Realia"]
    assert _content(spark, _leader("g"), _pad("", "z", 33)) == [
        "ProjectedMedium"
    ]


def test_music_profile_adds_type(spark):
    assert _content(spark, _leader("j"), _pad("", " ", 39)) == [
        "MusicRecording"
    ]


def test_006_adds_secondary_types(spark):
    # book with a serial 006 (periodical at 006/14)
    out = _content(
        spark, _leader("a", "m"), _pad("", " ", 39),
        f006s=[_pad("s", "p", 14, 18)],
    )
    assert out == ["Book", "Periodical"]


def test_thesis_tops_and_removes_manuscript(spark):
    # manuscript 006 -> Manuscript; 502 -> Thesis first, Manuscript gone
    out = _content(
        spark, _leader("a", "m"), _pad("", " ", 39),
        f006s=[_pad("t", " ", 17, 18)], has_502=True,
    )
    assert out == ["Thesis", "Book"]


def test_empty_fallbacks(spark):
    # leader/06 'n': type without profile -> nothing from 008 -> leader type
    assert _content(spark, _leader("n"), _pad("", " ", 39)) == [
        "SpecialInstructionalMaterial"
    ]
    # leader/06 'h': no type, no profile; 020 -> Book
    assert _content(spark, _leader("h"), None, has_020=True) == ["Book"]
    assert _content(spark, _leader("h"), None) == []


def test_primary_content_type(spark):
    df = spark.createDataFrame(
        [(_leader("e"), _pad("", "e", 25), None)],
        "leader string, f008 string, f006s array<string>",
    )
    assert df.select(
        primary_content_type_expr().alias("p")
    ).collect()[0]["p"] == "Atlas"


def test_is_archive(spark):
    df = spark.createDataFrame(
        [(_leader("a", "m", "a"),), (_leader("a", "m", " "),)],
        "leader string",
    )
    got = [r["a"] for r in df.select(is_archive_expr().alias("a")).collect()]
    assert got == [True, False]


# -- media types --------------------------------------------------------------

def test_media_245h_electronic(spark):
    assert _media(spark, title_h="[electronic resource] :") == ["Electronic"]
    assert _media(spark, title_h="[microform]") == []


def test_media_007_sound_disc_cd_lp(spark):
    assert _media(spark, f007s=["sd f"]) == ["SoundDisc", "SoundDiscCD"]
    assert _media(spark, f007s=["sd b"]) == ["SoundDisc", "SoundDiscLP"]
    assert _media(spark, f007s=["sd x"]) == ["SoundDisc"]
    assert _media(spark, f007s=["st |"]) == ["SoundTapeReel"]
    assert _media(spark, f007s=["sz |"]) == ["SoundRecordingOther"]


def test_media_007_video(spark):
    assert _media(spark, f007s=["vd cv"]) == ["VideoDVD"]
    assert _media(spark, f007s=["vd cs"]) == ["VideoBluRay"]
    assert _media(spark, f007s=["vf  b"]) == ["VideoVHS"]
    # short 007 (< 5): carrier form from byte 1
    assert _media(spark, f007s=["vf |"]) == ["VideoCassette"]
    assert _media(spark, f007s=["vz |"]) == ["VideoOther"]


def test_media_007_families(spark):
    assert _media(spark, f007s=["ad |"]) == ["Atlas"]
    assert _media(spark, f007s=["cr |"]) == ["Online"]
    assert _media(spark, f007s=["he |"]) == ["Microfiche"]
    assert _media(spark, f007s=["kh |"]) == ["PhotoPrint"]
    assert _media(spark, f007s=["ta |"]) == ["Print"]
    assert _media(spark, f007s=["o  |"]) == ["Kit"]
    assert _media(spark, f007s=["q  |"]) == ["MusicalScore"]


def test_media_007_malformed_skipped(spark):
    assert _media(spark, f007s=["sd"]) == []          # too short
    assert _media(spark, f007s=["sdxf"]) == []        # byte2 not undefined
    assert _media(spark, f007s=["sdxf", "sd f"]) == [
        "SoundDisc", "SoundDiscCD"
    ]


def test_media_form_of_item(spark):
    # books profile: byte 23
    out = _media(spark, leader=_leader("a", "m"), f008=_pad("", "o", 23))
    assert out == ["Online"]
    # maps profile: byte 29
    out = _media(spark, leader=_leader("e", "m"), f008=_pad("", "b", 29))
    assert out == ["Microfiche"]
    # 006 serial: byte 23 - 7 = 16
    out = _media(
        spark, leader=_leader("a", "m"), f006s=[_pad("s", "a", 16, 18)]
    )
    assert out == ["Microfilm"]
    # unknown code contributes nothing
    out = _media(spark, leader=_leader("a", "m"), f008=_pad("", "z", 23))
    assert out == []


def test_media_dedup_ordered(spark):
    out = _media(
        spark, leader=_leader("a", "m"), f008=_pad("", "s", 23),
        f007s=["cr |"], title_h="x [electronic resource]",
    )
    assert out == ["Electronic", "Online"]


# -- hasFullText + online -----------------------------------------------------

def _ft(spark, items):
    df = spark.createDataFrame(
        [(items,)],
        "f856s array<struct<ind2:string,url:string,note:string>>",
    )
    return df.select(has_full_text_expr().alias("x")).collect()[0]["x"]


def test_has_full_text(spark):
    assert _ft(spark, [("0", "http://x/doc", None)]) is True
    assert _ft(spark, [("2", "http://x/doc", None)]) is False
    assert _ft(spark, [(" ", "http://x/doc", "Table of Contents")]) is False
    assert _ft(spark, [(" ", "http://x/doc", "read online")]) is True
    # loc.gov double-check: fulltext by ind2 but only loc.gov urls
    assert _ft(spark, [("0", "http://www.loc.gov/catdir", None)]) is False
    assert _ft(spark, []) is False


def test_add_online_types(spark):
    df = spark.createDataFrame(
        [(["Book", "Periodical"], True), (["Map"], True), (["Book"], False)],
        "f array<string>, online boolean",
    )
    got = [
        r["t"]
        for r in df.select(
            add_online_types_expr(F.col("f"), F.col("online")).alias("t")
        ).collect()
    ]
    assert got == [
        ["EBook", "Book", "Periodical", "Online"],
        ["Map", "Online"],
        ["Book"],
    ]


def test_content_and_media_combined(spark):
    df = spark.createDataFrame(
        [(
            _leader("a", "m"), _pad("", "o", 23), None, ["cr |"],
            None, False, False,
            [("0", "http://example.org/full", None)],
        )],
        "leader string, f008 string, f006s array<string>,"
        " f007s array<string>, title_h string, has_502 boolean,"
        " has_020 boolean,"
        " f856s array<struct<ind2:string,url:string,note:string>>",
    )
    out = df.select(
        content_and_media_types_expr(
            title_h="title_h", has_502="has_502", has_020="has_020",
            f856s="f856s",
        ).alias("t")
    ).collect()[0]["t"]
    assert out == ["EBook", "Book", "Online"]


def test_with_mixin_types_matches_column_api(spark):
    """Staged DataFrame path == single-Column path on a row matrix
    covering every combine branch (thesis, fallback, online/EBook)."""
    from marc_solr_profiling_spark.functions.getformat import (
        with_mixin_types,
    )

    full = [("0", "http://example.org/full", None)]
    rows = [
        (_leader("a", "m"), _pad("", "o", 23), None, ["cr |"],
         None, False, False, full),                      # EBook/Book/Online
        (_leader("b"), None, None, None, None, True, False, None),  # Thesis
        (_leader("h"), None, None, None, None, False, True, None),  # 020
        (_leader("h"), None, None, None, None, False, False, None),  # empty
        (_leader("g", "m"), _pad("", "v", 33), ["m    v"],
         ["vd cv", "sd f"], "x [electronic resource]", False, False, []),
    ]
    schema = (
        "leader string, f008 string, f006s array<string>,"
        " f007s array<string>, title_h string, has_502 boolean,"
        " has_020 boolean,"
        " f856s array<struct<ind2:string,url:string,note:string>>"
    )
    df = spark.createDataFrame(rows, schema)
    kw = dict(title_h="title_h", has_502="has_502", has_020="has_020",
              f856s="f856s")
    staged = [r["t"] for r in
              with_mixin_types(df, out="t", **kw).select("t").collect()]
    single = [r["t"] for r in
              df.select(content_and_media_types_expr(**kw).alias("t"))
              .collect()]
    assert staged == single
    assert staged[0] == ["EBook", "Book", "Online"]
    assert staged[1][0] == "Thesis" and "Manuscript" not in staged[1]


def test_with_mixin_types_codegen(spark):
    """Scale-shape guard for the staged plan. Two invariants: (1) every
    Project WITHOUT a higher-order function compiles into a
    WholeStageCodegen span (the foldable-map _switch + named-column
    staging exist so no Project falls back on generated-code SIZE — a
    transform/filter/exists Project is CodegenFallback by Spark design
    and is exempt); (2) plan build+optimization stays sub-second (the
    pre-staging single-Column shape cost ~50s of optimizer time from
    expression self-duplication)."""
    import time

    from marc_solr_profiling_spark.functions.getformat import (
        with_mixin_types,
    )

    df = spark.range(8).select(
        F.lit(_leader("a", "m")).alias("leader"),
        F.lit(_pad("", "o", 23)).alias("f008"),
        F.lit(None).cast("array<string>").alias("f006s"),
        F.array(F.lit("cr |")).alias("f007s"),
        F.lit(None).cast("string").alias("title_h"),
        F.lit(False).alias("has_502"),
        F.lit(True).alias("has_020"),
        F.lit(None).cast(
            "array<struct<ind2:string,url:string,note:string>>"
        ).alias("f856s"),
    )
    t0 = time.monotonic()
    out = with_mixin_types(
        df, title_h="title_h", has_502="has_502", has_020="has_020",
        f856s="f856s",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan_secs = time.monotonic() - t0
    # non-HOF Projects must carry the codegen star; HOF ones are exempt
    import re
    hof = re.compile(r"\b(transform|filter|exists|aggregate)\(")
    bare = [ln for ln in plan.splitlines()
            if re.match(r"^[-+: ]*Project", ln) and "*" not in ln
            and not hof.search(ln)]
    assert not bare, f"non-HOF Project fell out of codegen:\n{plan}"
    assert "*" in plan  # at least one WholeStageCodegen span exists
    assert plan_secs < 5, f"plan build took {plan_secs:.1f}s"
    assert out.count() == 8
