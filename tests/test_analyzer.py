"""Pure-function tests for the analyzer chains — the analog of the
reference's scalar-util unit tier (``core/test/src/org/solrmarc/tools/
UtilUnitTests.java`` etc., SURVEY.md §5)."""

import unicodedata

import pytest

from marc_solr_profiling_spark.functions.analyzer import (
    alpha_sort_key,
    analyze_simple,
    analyze_text,
    analyze_text_nostem,
    icu_fold,
)
from marc_solr_profiling_spark.functions.stemmer import porter_stem


# Canonical examples from Porter's 1980 paper
PORTER_CASES = [
    ("caresses", "caress"), ("ponies", "poni"), ("cats", "cat"),
    ("agreed", "agre"), ("plastered", "plaster"), ("motoring", "motor"),
    ("conflated", "conflat"), ("hopping", "hop"), ("filing", "file"),
    ("happy", "happi"), ("relational", "relat"), ("digitizer", "digit"),
    ("operator", "oper"), ("decisiveness", "decis"), ("triplicate", "triplic"),
    ("electriciti", "electr"), ("adjustable", "adjust"), ("replacement", "replac"),
    ("adoption", "adopt"), ("activate", "activ"), ("effective", "effect"),
    ("probate", "probat"), ("rate", "rate"), ("controll", "control"),
    ("roll", "roll"), ("sky", "sky"),
]


@pytest.mark.parametrize("word,expected", PORTER_CASES)
def test_porter_stem(word, expected):
    assert porter_stem(word) == expected


def test_fold_nfc_nfd_identical():
    nfc = unicodedata.normalize("NFC", "Hà-tiên")
    nfd = unicodedata.normalize("NFD", "Hà-tiên")
    assert analyze_text(nfc) == analyze_text(nfd) == ["ha", "tien", "hatien"]


def test_word_delimiter_case_and_number():
    assert analyze_text_nostem("WiFi") == ["wi", "fi", "wifi"]
    assert analyze_text_nostem("wi-fi") == ["wi", "fi", "wifi"]
    assert analyze_text_nostem("MP3-Player") == ["mp", "3", "player", "mpplayer"]
    assert analyze_text_nostem("ISBN 0-13-110362-8") == [
        "isbn", "0", "13", "110362", "8", "0131103628",
    ]


def test_possessive():
    assert analyze_text_nostem("O'Brien's") == ["o", "brien", "obrien"]
    assert analyze_text("libraries'") == ["librari"]


def test_stemming_in_chain():
    assert analyze_text("running runs") == ["run", "run"]
    assert analyze_text("libraries") == ["librari"]


def test_cjk_rtl_passthrough_no_crash():
    assert analyze_text("紫禁城宮殿 test") == ["紫禁城宮殿", "test"]
    assert analyze_text("מבחן") == ["מבחן"]


def test_empty_and_whitespace():
    assert analyze_text("") == []
    assert analyze_text("   ") == []
    assert analyze_text(None) == []


def test_simple_chain():
    assert analyze_simple("The quick-brown FOX 42!") == [
        "the", "quick", "brown", "fox", "42",
    ]
    assert analyze_simple("") == []


def test_alpha_sort_key():
    assert alpha_sort_key("  Héllo World  ") == "hello world"
    assert alpha_sort_key(None) == ""


def test_icu_fold_idempotent():
    s = "Ωéÿ ﬁre"  # includes a compatibility ligature
    once = icu_fold(s)
    assert icu_fold(once) == once


# --- stopword + synonym chains (test/solr/conf/schema.xml:171-207) ---------


def test_parse_synonyms_group_and_mapping():
    from marc_solr_profiling_spark.functions.analyzer import parse_synonyms

    table = parse_synonyms([
        "# comment",
        "quick, fast",
        "colour => color",
        "",
    ])
    assert table["quick"] == ("quick", "fast")
    assert table["fast"] == ("quick", "fast")
    # one-way mapping replaces the source token
    assert table["colour"] == ("color",)
    assert "color" not in table


def test_chain_index_side_stops_no_synonyms():
    from marc_solr_profiling_spark.functions.analyzer import SolrTextChain

    chain = SolrTextChain(
        base="simple", stopwords=["the", "a"],
        synonyms={"quick": ("quick", "fast")},
    )
    # index side: stop filter only, synonyms never applied
    assert chain.index_tokens("The quick brown fox") == [
        "quick", "brown", "fox"
    ]


def test_chain_query_side_expands_synonyms():
    from marc_solr_profiling_spark.functions.analyzer import SolrTextChain

    chain = SolrTextChain(
        base="simple", stopwords=["the", "a"],
        synonyms={"quick": ("quick", "fast"), "fast": ("fast", "quick")},
    )
    assert chain.query_groups("the quick scan") == [
        ["quick", "fast"], ["scan"]
    ]


def test_chain_stop_synonym_ordering_asymmetry():
    from marc_solr_profiling_spark.functions.analyzer import SolrTextChain

    # a synonym whose target is itself a stopword: text_general order
    # (stop first) drops the source before expansion never happens;
    # text_en order (synonyms first) expands, then stop removes only
    # all-stopword groups
    syn = {"an": ("an", "one")}
    general = SolrTextChain("simple", stopwords=["an"], synonyms=syn,
                            synonyms_before_stop=False)
    en = SolrTextChain("simple", stopwords=["an"], synonyms=syn,
                       synonyms_before_stop=True)
    assert general.query_groups("an apple") == [["apple"]]
    assert en.query_groups("an apple") == [["an", "one"], ["apple"]]


def test_stop_filter_position_increments():
    from marc_solr_profiling_spark.functions.analyzer import (
        SolrTextChain, stop_filter_pos,
    )

    # enablePositionIncrements=true: gaps survive for phrase matching
    assert stop_filter_pos(
        ["war", "of", "the", "worlds"], frozenset({"of", "the"})
    ) == [("war", 0), ("worlds", 3)]
    chain = SolrTextChain("simple", stopwords=["of", "the"])
    assert chain.index_tokens_pos("War of the Worlds") == [
        ("war", 0), ("worlds", 3)
    ]


def test_stop_filter_expr_jvm_side(spark):
    import pyspark.sql.functions as F

    from marc_solr_profiling_spark.functions.analyzer import stop_filter_expr

    df = spark.createDataFrame(
        [(["the", "quick", "fox"],)], "tokens array<string>"
    )
    got = df.select(
        stop_filter_expr(F.col("tokens"), ["the", "a"]).alias("t")
    ).first()["t"]
    assert got == ["quick", "fox"]


# ---------------------------------------------------------------- /analysis/field debug

def test_analyze_field_debug_final_stage_matches_chain():
    from marc_solr_profiling_spark.functions.analyzer import (
        ANALYZERS,
        analyze_field_debug,
    )
    samples = [
        "The QUICK brown-Fox's 2nd (deja-vu) Café über XML2JSON",
        "", None, "MiXeD999case  punct!!! ßharp",
    ]
    for chain in ("text", "textNoStem", "simple"):
        for s in samples:
            stages = analyze_field_debug(s, chain)
            assert stages[-1][1] == ANALYZERS[chain](s), (chain, s)


def test_analyze_field_debug_stage_names():
    from marc_solr_profiling_spark.functions.analyzer import analyze_field_debug

    names = [n for n, _ in analyze_field_debug("FooBar baz", "text")]
    assert names == ["whitespace_tokenizer", "nfkc_normalize",
                     "word_delimiter", "icu_folding", "porter_stem",
                     "remove_duplicates"]
    names_ns = [n for n, _ in analyze_field_debug("FooBar baz", "textNoStem")]
    assert "porter_stem" not in names_ns
    # stage progression visible: delimiter splits case boundaries
    stages = dict(analyze_field_debug("FooBar", "text"))
    assert stages["whitespace_tokenizer"] == ["FooBar"]
    assert "foo" in stages["icu_folding"] or "Foo" in stages["word_delimiter"]


def test_analyze_field_debug_bad_chain():
    import pytest as _pytest

    from marc_solr_profiling_spark.functions.analyzer import analyze_field_debug
    with _pytest.raises(ValueError):
        analyze_field_debug("x", "nope")
