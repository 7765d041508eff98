"""Standard-query-parser + paging/suggest surface (round 4b).

Reference surface: the Lucene/Solr query parser features reachable
through the reference's edismax handler (prohibited ``-term`` clauses =
BooleanClause.Occur.MUST_NOT; wildcard ``pre*`` terms rewritten
CONSTANT_SCORE; fuzzy ``word~2`` via the same term dictionary the
DirectSolrSpellChecker uses, solrconfig-vanilla.xml:1256-1268), Solr
cursorMark deep paging (CursorMarkParams), facet.query
(FacetComponent), and the SuggestComponent.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from marc_solr_profiling_spark.functions.sort_spec import (
    apply_sort, cursor_after_expr, cursor_page)
from marc_solr_profiling_spark.operators.bm25 import (
    bm25_fuzzy_topk_plan, bm25_topk_sql_plan)
from marc_solr_profiling_spark.operators.facets import facet_queries
from marc_solr_profiling_spark.operators.spellcheck import suggest_prefix


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spark stream merge window", "en"),
        (2, "spark spark joins the stream", "en"),
        (3, "window merge scan filter sort", "de"),
        (4, "strange strategy strings", "en"),
        (5, "unrelated text about nothing", "fr"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


# --- prohibited clauses (MUST_NOT) --------------------------------------

def test_exclude_drops_matching_docs(docs):
    base = {r["doc_id"]: r["score"] for r in bm25_topk_sql_plan(
        docs, "spark stream", key_col="doc_id", k=10).collect()}
    out = {r["doc_id"]: r["score"] for r in bm25_topk_sql_plan(
        docs, "spark stream", key_col="doc_id", k=10,
        exclude_query="window").collect()}
    # docs 1 and 3 contain 'window'; doc 1 matched the query and must go
    assert 1 in base and 1 not in out
    # survivors keep their UNFILTERED scores (MUST_NOT never rescores)
    for key, score in out.items():
        assert score == base[key]


def test_exclude_unknown_term_is_noop(docs):
    base = bm25_topk_sql_plan(docs, "spark", key_col="doc_id").collect()
    out = bm25_topk_sql_plan(
        docs, "spark", key_col="doc_id", exclude_query="zzzmissing").collect()
    assert [(r["doc_id"], r["score"]) for r in base] == \
           [(r["doc_id"], r["score"]) for r in out]


# --- required clauses (MUST) ----------------------------------------------

def test_require_gates_and_scores(docs):
    # '+spark merge': doc 3 matches 'merge' but lacks required 'spark'
    out = {r["doc_id"]: r["score"] for r in bm25_topk_sql_plan(
        docs, "merge", key_col="doc_id", require_query="spark").collect()}
    assert 3 not in out and set(out) == {1, 2}
    # required term SCORES: doc 2 (no 'merge', spark tf=2) appears with a
    # pure-spark score; equal to scoring query 'merge spark' directly
    both = {r["doc_id"]: r["score"] for r in bm25_topk_sql_plan(
        docs, "merge spark", key_col="doc_id").collect()}
    for key, score in out.items():
        assert score == both[key]


def test_require_gates_constant_score_clauses(docs):
    # a MUST clause applies to the WHOLE BooleanQuery: doc 4 matches the
    # wildcard 'str*' but lacks required 'spark' -> excluded
    out = {r["doc_id"] for r in bm25_topk_sql_plan(
        docs, "", key_col="doc_id", wildcard="str",
        require_query="spark").collect()}
    assert out == {1, 2}


# --- wildcard constant-score clause --------------------------------------

def test_wildcard_constant_score_or_combination(docs):
    out = {r["doc_id"]: r["score"] for r in bm25_topk_sql_plan(
        docs, "merge", key_col="doc_id", k=10, wildcard="str").collect()}
    bm = {r["doc_id"]: r["score"] for r in bm25_topk_sql_plan(
        docs, "merge", key_col="doc_id", k=10).collect()}
    # doc 4 matches ONLY the wildcard (strange/strategy/strings): score 1.0
    assert out[4] == 1.0
    # doc 2 matches only via wildcard 'stream'
    assert out[2] == 1.0
    # doc 1 matches both: bm25(merge) + 1.0
    assert out[1] == pytest.approx(bm[1] + 1.0, abs=1e-9)
    # doc 3 matches only the scored term: unchanged
    assert out[3] == bm[3]
    assert 5 not in out


def test_wildcard_only_query(docs):
    out = bm25_topk_sql_plan(
        docs, "", key_col="doc_id", wildcard="str").collect()
    assert sorted(r["doc_id"] for r in out) == [1, 2, 4]
    assert all(r["score"] == 1.0 for r in out)


def test_term_range_constant_score(docs):
    # [sp TO st] inclusive covers 'spark' only ('sort' < 'sp',
    # 'stream' > 'st'): docs 1 and 2, each at the constant 1.0
    out = {r["doc_id"]: r["score"] for r in bm25_topk_sql_plan(
        docs, "", key_col="doc_id", term_range=("sp", "st")).collect()}
    assert out == {1: 1.0, 2: 1.0}


def test_wildcard_and_range_stack(docs):
    # both multi-term clauses present: contributions add per clause
    out = {r["doc_id"]: r["score"] for r in bm25_topk_sql_plan(
        docs, "", key_col="doc_id", wildcard="str",
        term_range=("sp", "st")).collect()}
    assert out[1] == 2.0   # spark (range) + stream/str* (wildcard)
    assert out[4] == 1.0   # strange/strategy/strings: wildcard only


# --- edismax boosts (bq / bf / boost) --------------------------------------

def test_bq_adds_only_to_main_matches(docs):
    base = {r["doc_id"]: r["score"] for r in bm25_topk_sql_plan(
        docs, "merge", key_col="doc_id").collect()}
    spark_only = {r["doc_id"]: r["score"] for r in bm25_topk_sql_plan(
        docs, "spark", key_col="doc_id").collect()}
    out = {r["doc_id"]: r["score"] for r in bm25_topk_sql_plan(
        docs, "merge", key_col="doc_id",
        boost_query="spark", boost_weight=0.5).collect()}
    # result set unchanged: doc 2 matches only bq -> still absent
    assert set(out) == set(base) and 2 not in out
    # doc 1 matches both: main + 0.5 * bq
    assert out[1] == pytest.approx(base[1] + 0.5 * spark_only[1], abs=1e-4)
    # doc 3 matches only main: unchanged
    assert out[3] == base[3]


def test_bf_and_boost_application_order(docs):
    base = {r["doc_id"]: r["score"] for r in bm25_topk_sql_plan(
        docs, "merge", key_col="doc_id").collect()}
    out = {r["doc_id"]: r["score"] for r in bm25_topk_sql_plan(
        docs, "merge", key_col="doc_id",
        boost_function=F.lit(2.0),
        boost=F.lit(1.0) + (F.col("doc_id") % 2) * 1.0).collect()}
    # (main + bf) * boost, boost = 2 for odd doc_ids, 1 for even
    for key in base:
        mult = 2.0 if key % 2 else 1.0
        assert out[key] == pytest.approx((base[key] + 2.0) * mult, abs=1e-4)


# --- fuzzy term -----------------------------------------------------------

def test_fuzzy_expansion_and_group_stats(docs):
    # 'sprak'~2 expands (prefix 's', <=2 edits) to 'spark' (d=2... d=1
    # transposition counts 2 in classic levenshtein — still <=2), 'scan'?
    # levenshtein(sprak, scan)=3 -> excluded. Group df counts docs with ANY
    # member; here members present in docs 1,2 only.
    out = {r["doc_id"]: r["score"] for r in bm25_fuzzy_topk_plan(
        docs, "sprak", key_col="doc_id", max_edits=2).collect()}
    assert set(out) == {1, 2}
    # doc 2 has tf=2 for 'spark' -> must outrank doc 1 (equal doc_len 5 vs 4
    # — verify by direct computation)
    n, df = 5, 2
    idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    avgdl = (4 + 5 + 5 + 3 + 4) / 5.0

    def s(tf, dl):
        return round(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 4)

    assert out[1] == pytest.approx(s(1, 4))
    assert out[2] == pytest.approx(s(2, 5))


def test_fuzzy_prefix_gate(docs):
    # 'park' is 1 edit from 'spark' but fails the prefixLength=1 gate
    out = bm25_fuzzy_topk_plan(docs, "park", key_col="doc_id").collect()
    assert all(r["doc_id"] not in (1, 2) for r in out) or not out


# --- cursorMark paging ----------------------------------------------------

def test_cursor_pages_tile_the_full_order(docs):
    spec = "lang asc, doc_id desc"
    full = [(r["lang"], r["doc_id"])
            for r in apply_sort(docs.select("lang", "doc_id"), spec).collect()]
    pages, cursor = [], None
    while True:
        page = cursor_page(
            docs.select("lang", "doc_id"), spec, cursor, page_size=2).collect()
        if not page:
            break
        pages.extend((r["lang"], r["doc_id"]) for r in page)
        cursor = (page[-1]["lang"], page[-1]["doc_id"])
    assert pages == full


def test_cursor_after_ties_on_leading_key(docs):
    spec = "lang asc, doc_id asc"
    # cursor inside the 'en' run: strictly-after must keep later en docs
    out = cursor_page(docs.select("lang", "doc_id"), spec, ("en", 1), 10)
    got = [(r["lang"], r["doc_id"]) for r in out.collect()]
    assert got == [("en", 2), ("en", 4), ("fr", 5)]


def test_cursor_len_mismatch_raises():
    with pytest.raises(ValueError):
        cursor_after_expr("a asc, b desc", (1,))


# --- facet.query -----------------------------------------------------------

def test_facet_queries_one_pass_counts(docs):
    out = {r["facet"]: r["count"] for r in facet_queries(docs, {
        "en": F.col("lang") == "en",
        "has_spark": F.col("text").contains("spark"),
        "nothing": F.lit(False),
    }).collect()}
    assert out == {"en": 3, "has_spark": 2, "nothing": 0}


def test_facet_queries_sql_string_predicates(docs):
    out = {r["facet"]: r["count"] for r in
           facet_queries(docs, {"de_or_fr": "lang IN ('de','fr')"}).collect()}
    assert out == {"de_or_fr": 2}


def test_facet_queries_empty_raises(docs):
    with pytest.raises(ValueError):
        facet_queries(docs, {})


# --- suggester --------------------------------------------------------------

def test_suggest_weight_is_total_tf(docs):
    out = [(r["term"], r["weight"])
           for r in suggest_prefix(docs, "s", count=10).collect()]
    d = dict(out)
    assert d["spark"] == 3       # tf 1 (doc1) + 2 (doc2)
    assert d["stream"] == 2
    # ranking: weight desc then term asc
    assert out == sorted(out, key=lambda t: (-t[1], t[0]))


def test_suggest_prefix_filters(docs):
    terms = [r["term"] for r in suggest_prefix(docs, "str", count=10).collect()]
    assert terms and all(t.startswith("str") for t in terms)
