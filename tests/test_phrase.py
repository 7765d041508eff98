"""Positional phrase matching (Lucene PhraseQuery slop 0 — the capability
behind the reference's edismax ``qs``/``ps`` phrase params,
``solrconfig.xml:68-82``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from marc_solr_profiling_spark.operators.bm25 import (
    bm25_topk_sql_plan,
    phrase_match_expr,
)

DOCS = [
    (0, "the quick brown fox jumps"),
    (1, "quick brown"),
    (2, "brown quick"),            # reversed — no adjacency
    (3, "quick x brown"),          # gap — no adjacency at slop 0
    (4, "quick"),                  # shorter than the phrase
    (5, ""),                       # empty doc
    (6, "a quick brown quick brown b"),  # multiple occurrences
    (7, "ends with quick brown"),  # match at the very end
]


@pytest.fixture(scope="module")
def toks(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    return df.select(
        "doc_id", F.split(F.col("text"), " +").alias("tokens")
    ).select(
        "doc_id",
        F.filter("tokens", lambda t: t != "").alias("tokens"),
    )


def _matched(toks, phrase, slop=0):
    out = toks.filter(phrase_match_expr("tokens", phrase, slop=slop))
    return sorted(r["doc_id"] for r in out.select("doc_id").collect())


def test_adjacent_bigram(toks):
    assert _matched(toks, ["quick", "brown"]) == [0, 1, 6, 7]


def test_reversed_and_gapped_do_not_match(toks):
    assert _matched(toks, ["brown", "fox", "jumps"]) == [0]
    assert _matched(toks, ["x", "quick"]) == []


def test_single_term_phrase_degenerates_to_contains(toks):
    assert _matched(toks, ["quick"]) == [0, 1, 2, 3, 4, 6, 7]


def test_phrase_longer_than_doc_is_false_not_error(toks):
    # the sequence(1, n) guard: n < 1 must short-circuit to false
    assert _matched(toks, ["the", "quick", "brown", "fox", "jumps", "z"]) == []


def test_empty_phrase_matches_nothing(toks):
    assert _matched(toks, []) == []


def test_unclean_term_rejected(toks):
    with pytest.raises(ValueError):
        phrase_match_expr("tokens", ["quick'; --"])


def test_slop_ordered_window(toks):
    # slop 1: one intervening token allowed, order preserved
    assert _matched(toks, ["quick", "brown"], slop=1) == [0, 1, 3, 6, 7]
    # reversed still never matches (in-order semantics)
    assert _matched(toks, ["brown", "quick"], slop=1) == [2, 6]
    # doc 2 "brown quick": adjacency; doc 6 "... brown quick brown ..." has
    # brown->quick adjacency too
    # 3-term phrase: doc 0 = "the(1) ... brown(3) ... jumps(5)", span 4;
    # window = (m-1) + slop, so slop 1 (window 3) misses, slop 2 matches
    assert _matched(toks, ["the", "brown", "jumps"], slop=1) == []
    assert _matched(toks, ["the", "brown", "jumps"], slop=2) == [0]
    assert _matched(toks, ["the", "brown", "jumps"], slop=0) == []


def test_slop_zero_equals_exact(toks):
    for phrase in (["quick", "brown"], ["quick"], ["brown", "fox", "jumps"]):
        exact = _matched(toks, phrase)
        assert _matched(toks, phrase, slop=0) == exact


def test_phrase_gate_on_bm25_plan(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in DOCS], ["doc_id", "text"]
    )
    out = bm25_topk_sql_plan(
        docs, "quick brown", key_col="doc_id", k=10, chain="simple",
        phrase="quick brown",
    )
    got = sorted(r["doc_id"] for r in out.collect())
    assert got == [0, 1, 6, 7]
    # scores use corpus-wide stats: the same docs scored without the
    # phrase gate must carry identical scores
    ungated = bm25_topk_sql_plan(
        docs, "quick brown", key_col="doc_id", k=10, chain="simple"
    )
    gated_scores = {
        r["doc_id"]: r["score"] for r in out.collect()
    }
    ungated_scores = {
        r["doc_id"]: r["score"] for r in ungated.collect()
    }
    for d, s in gated_scores.items():
        assert ungated_scores[d] == s


def test_filter_query_keeps_collection_wide_scores(spark):
    """Solr fq semantics: the filtered top-k is the unfiltered ranking
    restricted to passing docs — scores identical, no re-scoring against
    the filtered subset."""
    from pyspark.sql import functions as F

    from marc_solr_profiling_spark.operators.bm25 import bm25_topk_sql_plan

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = "spark merge window stream"
    unfiltered = {r["doc_id"]: r["score"] for r in bm25_topk_sql_plan(
        docs, q, key_col="doc_id", k=500, chain="simple").collect()}
    fq = bm25_topk_sql_plan(
        docs, q, key_col="doc_id", k=10, chain="simple",
        filter_query=F.col("lang") == "en").collect()
    en_ids = {r["doc_id"] for r in
              docs.filter("lang = 'en'").select("doc_id").collect()}
    assert len(fq) == 10
    assert all(r["doc_id"] in en_ids for r in fq)
    for r in fq:  # same scores as the unfiltered ranking
        assert unfiltered[r["doc_id"]] == r["score"]
    # and it is exactly the en-restriction of the unfiltered order
    want = sorted(((s, d) for d, s in unfiltered.items() if d in en_ids),
                  key=lambda t: (-t[0], t[1]))[:10]
    assert [(r["score"], r["doc_id"]) for r in fq] == want


def test_grouped_topk_collapse_semantics(spark):
    """Field collapse: groups ranked by best doc, per-group numFound
    counts ALL matching docs (not just the shown ones), ranks start at 1
    within each group."""
    from marc_solr_profiling_spark.operators.bm25 import bm25_grouped_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = bm25_grouped_topk(
        docs, "spark merge window stream", group_col="lang",
        k_groups=2, k_per_group=2).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["lang"], []).append(r)
    assert len(by_group) == 2
    for g, rows in by_group.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= 2
        # numFound >= shown rows and is identical on every group row
        assert len({r["group_found"] for r in rows}) == 1
        assert rows[0]["group_found"] >= len(rows)
        # within-group ordering by score desc
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_highlight_topk_fragment_semantics(spark):
    from marc_solr_profiling_spark.operators.bm25 import highlight_topk

    docs = spark.createDataFrame(
        [(0, ("x " * 40) + "the Window frame appears here once"),
         (1, "stream at the very start of this document text"),
         (2, "no matching terms at all in this one, padding padding")],
        "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in highlight_topk(
        docs, "window stream", key_col="doc_id", k=10).collect()}
    # doc 1: match at pos 1 -> window starts at 1
    assert got[1]["matched_term"] == "stream" and got[1]["match_pos"] == 1
    assert got[1]["snippet"].startswith("stream at the very")
    # doc 0: case-insensitive locate; snippet window reaches 30 chars back
    assert got[0]["matched_term"] == "window"
    p = got[0]["match_pos"]
    assert got[0]["snippet"] == (("x " * 40)
                                 + "the Window frame appears here once")[
                                     p - 31:p - 31 + 60]
    # doc 2 scored (OR query, zero matched terms -> absent from top-k)
    assert 2 not in got
