"""Query-STRING front door (functions/query_parser.py +
bm25.bm25_query_string_topk) and per-clause boosts (term^W).

Reference surface: the flat Lucene query-string grammar the reference's
``defType=lucene`` handlers accept (test/solr/conf/solrconfig.xml:69-81,
SolrReIndexer.java:34) — occur prefixes, phrase + slop, clause boosts,
wildcard/range multi-term clauses, fuzzy terms, uniform AND/OR.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from marc_solr_profiling_spark.functions.query_parser import (
    ParsedQuery, QueryStringError, parse_query_string)
from marc_solr_profiling_spark.operators.bm25 import (
    bm25_fuzzy_topk_plan, bm25_query_string_topk, bm25_topk_sql_plan)


# --- pure parsing --------------------------------------------------------

def test_parse_all_clause_types():
    pq = parse_query_string(
        '+spark -batch merge^2 plain "table hash"~1 str* [sa TO sz]')
    assert pq.require_terms == ["spark"]
    assert pq.exclude_terms == ["batch"]
    assert pq.should_terms == ["merge", "plain"]
    assert pq.term_boosts == {"merge": 2.0}
    assert pq.phrase == "table hash" and pq.phrase_slop == 1
    assert pq.wildcards == ["str"]
    assert pq.term_range == ("sa", "sz")
    kw = pq.plan_kwargs()
    assert kw["query"] == "merge plain"
    assert kw["require_query"] == "spark"
    assert kw["exclude_query"] == "batch"
    assert kw["wildcard"] == ["str"]


def test_parse_operators_and_not():
    assert parse_query_string("a AND b AND c").min_match == "100%"
    assert parse_query_string("a OR b").min_match is None
    pq = parse_query_string("spark NOT window")
    assert pq.exclude_terms == ["window"]
    assert pq.should_terms == ["spark"]


def test_parse_fuzzy():
    pq = parse_query_string("sparc~2")
    assert pq.fuzzy == [("sparc", 2)]
    assert parse_query_string("sparc~").fuzzy == [("sparc", 2)]
    with pytest.raises(QueryStringError):
        pq.plan_kwargs()  # fuzzy never reaches the structured plan


@pytest.mark.parametrize("bad", [
    "", "   ", "title:foo", "(a OR b)", "a AND b OR c", '"unbalanced',
    '"p one" "p two"', "*lead", "mid*dle*", "+str*", "-sparc~1",
    "merge^2~1", "NOT +x", "a NOT", "-only", "[a TO b] [c TO d]",
    "back\\slash", "spark sparc~1",
])
def test_parse_rejects_loudly(bad):
    with pytest.raises(QueryStringError):
        parse_query_string(bad)


def test_boost_binds_after_occur():
    pq = parse_query_string("+spark^3 merge")
    assert pq.require_terms == ["spark"]
    assert pq.term_boosts == {"spark": 3.0}


# --- term boosts through the plan ----------------------------------------

@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spark stream merge window"),
        (2, "spark spark joins the stream"),
        (3, "window merge scan filter sort"),
        (4, "strange strategy strings"),
        (5, "unrelated text about nothing"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _scores(df):
    return {r["doc_id"]: r["score"] for r in df.collect()}


def test_term_boost_scales_only_that_clause(docs):
    base = bm25_topk_sql_plan(
        docs, "merge", key_col="doc_id", k=10, round_to=6)
    merged = _scores(base)
    boosted = _scores(bm25_topk_sql_plan(
        docs, "merge", key_col="doc_id", k=10, round_to=6,
        term_boosts={"merge": 2.0}))
    for key, s in merged.items():
        assert boosted[key] == pytest.approx(2.0 * s, abs=2e-6)
    # a clause NOT in the boosts map keeps weight 1.0
    two = _scores(bm25_topk_sql_plan(
        docs, "merge spark", key_col="doc_id", k=10, round_to=6,
        term_boosts={"merge": 2.0}))
    only_spark = _scores(bm25_topk_sql_plan(
        docs, "spark", key_col="doc_id", k=10, round_to=6))
    # doc 2 matches only 'spark': its score must be the unboosted one
    assert two[2] == pytest.approx(only_spark[2], abs=2e-6)


def test_boost_on_absent_term_is_noop(docs):
    base = _scores(bm25_topk_sql_plan(docs, "merge", key_col="doc_id"))
    out = _scores(bm25_topk_sql_plan(
        docs, "merge", key_col="doc_id", term_boosts={"zzz": 9.0}))
    assert base == out


# --- end-to-end front door ------------------------------------------------

def test_qstring_equals_structured(docs):
    via_string = bm25_query_string_topk(
        docs, '+spark -window merge^2 str*', key_col="doc_id", k=10)
    structured = bm25_topk_sql_plan(
        docs, "merge", key_col="doc_id", k=10,
        require_query="spark", exclude_query="window",
        term_boosts={"merge": 2.0}, wildcard=["str"])
    assert [tuple(r) for r in via_string.collect()] == \
           [tuple(r) for r in structured.collect()]


def test_qstring_fuzzy_dispatch(docs):
    via_string = bm25_query_string_topk(
        docs, "sparc~1", key_col="doc_id", k=10)
    direct = bm25_fuzzy_topk_plan(
        docs, "sparc", key_col="doc_id", k=10, max_edits=1)
    assert [tuple(r) for r in via_string.collect()] == \
           [tuple(r) for r in direct.collect()]


def test_qstring_phrase_and_operator(docs):
    out = bm25_query_string_topk(
        docs, 'spark AND stream "spark stream"', key_col="doc_id", k=10)
    rows = out.collect()
    # only doc 1 contains the exact adjacency AND both terms
    assert [r["doc_id"] for r in rows] == [1]


def test_qstring_kwarg_conflict_raises(docs):
    with pytest.raises(QueryStringError):
        bm25_query_string_topk(
            docs, "-window merge", key_col="doc_id",
            exclude_query="spark")


def test_qstring_passthrough_filter_query(docs):
    out = bm25_query_string_topk(
        docs, "merge", key_col="doc_id", filter_query="doc_id > 1")
    assert {r["doc_id"] for r in out.collect()} == {3}
