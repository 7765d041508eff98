"""SpellCheckComponent + QueryElevationComponent analogs.

Reference surface: solrconfig-vanilla.xml:1244-1362 (/spell handler,
DirectSolrSpellChecker: maxEdits=2 minPrefix=1 minQueryLength=4
accuracy=0.5 count=5) and :1522-1537 (/elevate handler + elevate.xml).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from marc_solr_profiling_spark.operators.bm25 import (
    bm25_topk_sql_plan, elevate_topk)
from marc_solr_profiling_spark.operators.spellcheck import spellcheck_suggest


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the spark stream merges windows of sparse data"),
        (2, "spark spark spark joins the sorted stream"),
        (3, "window merge scan filter sort"),
        (4, "sport sport sport sport"),
        (5, "unrelated text about nothing at all"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


# --- spellcheck ---------------------------------------------------------

def test_suggestions_ranked_and_gated(docs):
    out = spellcheck_suggest(docs, "sprk", count=5).collect()
    terms = [r["term"] for r in out]
    # distance-1 'spark' must outrank every distance-2 candidate
    assert terms[0] == "spark"
    for r in out:
        assert r["distance"] <= 2
        assert r["term"].startswith("s")
        assert r["similarity"] >= 0.5


def test_min_query_length_declines(docs):
    # 'spk' has length 3 < minQueryLength 4 -> component declines
    assert spellcheck_suggest(docs, "spk").count() == 0


def test_prefix_gate(docs):
    # 'park' is 1 edit from 'spark' but fails the minPrefix=1 gate
    # (first char 'p' vs dictionary 'spark' starting 's')
    out = spellcheck_suggest(docs, "park").collect()
    assert all(r["term"].startswith("p") for r in out)
    assert "spark" not in [r["term"] for r in out]


def test_accuracy_threshold(docs):
    # with accuracy=1.0 nothing but exact matches would pass, and the
    # query term itself is excluded -> empty
    assert spellcheck_suggest(docs, "sprk", accuracy=1.0).count() == 0


def test_df_tiebreak(docs):
    # 'sport' (df 1) and 'sort' (df 1) vs 'spark' (df 2): same-similarity
    # candidates order by df desc then term asc; deterministic output
    out1 = [r["term"] for r in spellcheck_suggest(docs, "sprk").collect()]
    out2 = [r["term"] for r in spellcheck_suggest(docs, "sprk").collect()]
    assert out1 == out2


# --- elevation ----------------------------------------------------------

def test_elevated_docs_pinned_in_order(docs):
    out = elevate_topk(docs, "spark stream", [3, 2], k=5).collect()
    assert [r["doc_id"] for r in out[:2]] == [3, 2]
    assert out[0]["elevated"] and out[1]["elevated"]
    # doc 3 matches neither 'spark' nor 'stream' -> forceElevation keeps
    # it with NULL score
    assert out[0]["score"] is None
    assert out[1]["score"] is not None


def test_rest_in_bm25_order(docs):
    out = elevate_topk(docs, "spark stream", [3], k=5).collect()
    tail = [r for r in out if not r["elevated"]]
    scores = [r["score"] for r in tail]
    assert scores == sorted(scores, reverse=True)
    # the non-elevated tail is exactly the BM25 order minus elevated ids
    plain = bm25_topk_sql_plan(
        docs, "spark stream", k=5).collect()
    expect = [r["doc_id"] for r in plain if r["doc_id"] != 3]
    assert [r["doc_id"] for r in tail] == expect[:len(tail)]


def test_force_false_drops_nonmatching(docs):
    out = elevate_topk(docs, "spark stream", [3, 2], k=5,
                       force=False).collect()
    ids = [r["doc_id"] for r in out]
    assert 3 not in ids          # doc 3 does not match and force=False
    assert ids[0] == 2           # doc 2 matches and is pinned first


def test_elevated_flag_column(docs):
    out = elevate_topk(docs, "spark stream", [2], k=5)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "score", "elevated"]
    n_elev = out.filter(F.col("elevated")).count()
    assert n_elev == 1


# --- debug explain ------------------------------------------------------

def test_explain_rows_sum_to_score(docs):
    from marc_solr_profiling_spark.operators.bm25 import explain_topk

    out = explain_topk(docs, "spark stream", k=3, round_to=6).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert by_doc
    for doc_id, rows in by_doc.items():
        total = rows[0]["score"]
        assert abs(sum(r["term_score"] for r in rows) - total) < 1e-4
        # matches the plain top-k score for the same doc
    plain = {r["doc_id"]: r["score"] for r in bm25_topk_sql_plan(
        docs, "spark stream", k=3, round_to=6).collect()}
    assert {d: rows[0]["score"] for d, rows in by_doc.items()} == plain


def test_explain_only_matched_terms(docs):
    from marc_solr_profiling_spark.operators.bm25 import explain_topk

    out = explain_topk(docs, "spark stream", k=3).collect()
    # doc 2 has no 'window'; every row's term must be a query term the
    # doc actually contains
    for r in out:
        assert r["term"] in ("spark", "stream")
        assert r["tf"] >= 1


# --- result clustering --------------------------------------------------

def test_cluster_labels_exclude_query_terms(docs):
    from marc_solr_profiling_spark.operators.bm25 import cluster_topk

    out = cluster_topk(docs, "spark stream", k=3).collect()
    # only docs 1 and 2 match the query -> one labeled row each
    assert len(out) == 2
    for r in out:
        assert r["label"] not in ("spark", "stream")
        assert r["salience"] is not None


def test_cluster_label_is_max_salience(spark):
    from marc_solr_profiling_spark.operators.bm25 import cluster_topk

    # 'zebra' appears once in one doc only (df=1, max idf); 'common' is
    # everywhere (idf ~ 0) -> doc 1's label must be zebra
    rows = [
        (1, "query common zebra common"),
        (2, "query common common common"),
        (3, "query common common apple"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["label"]
           for r in cluster_topk(d, "query", k=3).collect()}
    assert out[1] == "zebra"
    assert out[3] == "apple"
