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
