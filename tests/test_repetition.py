"""Training-pipeline text hygiene: Gopher repetition signals
(textstats.repetition_signals) and exact-substring n-gram dedup
(dedup.ngram_removal_stats) — hand-computed fixtures."""

from __future__ import annotations

import pytest

from marc_solr_profiling_spark.functions.textstats import repetition_signals
from marc_solr_profiling_spark.operators.dedup import ngram_removal_stats


def test_repetition_signals_hand_computed(spark):
    rows = [
        # "a b a b": tokens 4, distinct 2 -> ttr .5
        # 2-grams: "a b","b a","a b" -> top "a b" 2/3
        # <5 tokens -> dup5 0
        (0, "a b a b"),
        # all-distinct 6 tokens: ttr 1, top2 1/5, dup5: 2 distinct 5-grams
        # each once -> 0
        (1, "u v w x y z"),
        # "a b c d e a b c d e": 5-grams (6 of them): "a b c d e" at 1 and
        # 6 -> dup occurrences 2 of 6
        (2, "a b c d e a b c d e"),
        (3, ""),  # empty: drops out entirely
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r.asDict()
        for r in repetition_signals(docs).collect()
    }
    assert set(got) == {0, 1, 2}
    assert got[0]["n_tokens"] == 4
    assert got[0]["ttr"] == pytest.approx(0.5)
    assert got[0]["top2_frac"] == pytest.approx(round(2 / 3, 6))
    assert got[0]["dup5_frac"] == 0.0
    assert got[1]["ttr"] == 1.0
    assert got[1]["top2_frac"] == pytest.approx(0.2)
    assert got[1]["dup5_frac"] == 0.0
    assert got[2]["ttr"] == pytest.approx(0.5)
    assert got[2]["dup5_frac"] == pytest.approx(round(2 / 6, 6))


def test_ngram_removal_hand_computed(spark):
    shared = "one two three four five six seven eight"  # one shared 8-gram
    rows = [
        (0, shared + " tail0 a b c"),
        (1, "head1 x " + shared),
        (2, "totally different words with no overlap at all here"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r.asDict()
        for r in ngram_removal_stats(docs, n=8, min_docs=2).collect()
    }
    # docs 0 and 1 share exactly the 8-token run; doc 2 untouched
    assert set(got) == {0, 1}
    assert got[0]["n_tokens"] == 12
    assert got[0]["n_removed"] == 8
    assert got[0]["removed_frac"] == pytest.approx(round(8 / 12, 6))
    assert got[1]["n_tokens"] == 10
    assert got[1]["n_removed"] == 8


def test_ngram_removal_overlapping_spans_not_double_counted(spark):
    # 9 shared tokens -> two overlapping duplicated 8-grams covering 9
    # positions, not 16
    shared = "t1 t2 t3 t4 t5 t6 t7 t8 t9"
    rows = [(0, shared + " endA"), (1, shared + " endB")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["n_removed"]
        for r in ngram_removal_stats(docs, n=8, min_docs=2).collect()
    }
    assert got == {0: 9, 1: 9}


def test_ngram_removal_within_doc_repeat_not_flagged(spark):
    # the same 8-gram twice INSIDE one doc is not cross-doc duplication
    # (min_docs counts DISTINCT docs)
    shared = "r1 r2 r3 r4 r5 r6 r7 r8"
    docs = spark.createDataFrame(
        [(0, shared + " mid " + shared)], ["doc_id", "text"]
    )
    assert ngram_removal_stats(docs, n=8, min_docs=2).collect() == []


def test_gopher_flags_each_rule_fires(spark):
    from marc_solr_profiling_spark.functions.textstats import (
        gopher_quality_flags,
    )

    rows = [
        # clean: all-distinct tokens (no repeated 2-gram), both stopwords
        (0, " ".join(f"tok{i}xx" for i in range(20)) + " the of"),
        (1, "tiny doc"),                                   # too short
        (2, " ".join(f"t{i}" for i in range(200))),        # too long
        (3, " ".join("ab" for _ in range(40))),            # word len low
        (4, " ".join(f"pneumonoultra{i}" for i in range(40))),  # len high
        (5, " ".join(f"u{i}vw" for i in range(40))),       # no stopwords
        (6, "!!! ??? " * 30 + "the of " * 20),             # punct heavy
        (7, ("the of " * 40).strip()),                     # repetition
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    flags = {
        r["doc_id"]: r.asDict()
        for r in gopher_quality_flags(
            docs, min_tokens=20, max_tokens=100,
            min_mean_word_len=3.0, max_mean_word_len=10.0,
            min_distinct_stopwords=2, max_punct_ratio=0.25,
            max_top2_frac=0.2, max_dup5_frac=0.3,
        ).collect()
    }
    assert flags[1]["r_too_short"]
    assert flags[2]["r_too_long"]
    assert flags[3]["r_word_len"]          # mean length 2
    assert flags[4]["r_word_len"]          # mean length > 10
    assert flags[5]["r_stopwords"]
    assert flags[6]["r_punct"]
    assert flags[7]["r_top2"] and flags[7]["r_dup5"]
    clean = flags[0]
    assert not any(
        clean[r] for r in (
            "r_too_short", "r_too_long", "r_word_len", "r_stopwords",
            "r_punct", "r_top2", "r_dup5",
        )
    )


def test_gopher_filter_stats_kept_consistent(spark):
    from marc_solr_profiling_spark.functions.textstats import (
        gopher_filter_stats,
    )

    rows = [
        (0, " ".join(f"tok{i}xx" for i in range(20)) + " the of"),
        (1, "tiny doc"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["rule"]: r["n"]
        for r in gopher_filter_stats(docs, min_tokens=20).collect()
    }
    assert got["kept"] == 1
    assert got["r_too_short"] == 1
