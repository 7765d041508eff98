"""Edismax dismax multi-field scoring (solrconfig.xml:64-83 qf + tie):
per-field stats, per-term DisjunctionMax combine, tie-breaker."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from marc_solr_profiling_spark.operators.bm25 import bm25_dismax_topk_plan

K1, B = 1.2, 0.75


def _bm25(tf, df, n_docs, dl, avgdl):
    idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    return idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "apple pie", "apple pie recipe with apple"),
        (1, "banana split", "banana and apple dessert"),
        (2, "cherry cake", "cherry cherry cherry"),
        (3, "apple news", "no fruit here at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "title", "body"])
    return df.select(
        "doc_id",
        F.expr("regexp_extract_all(lower(title), '[a-z0-9]+', 0)")
        .alias("title_tk"),
        F.expr("regexp_extract_all(lower(body), '[a-z0-9]+', 0)")
        .alias("body_tk"),
    )


def test_dismax_hand_computed(docs):
    out = bm25_dismax_topk_plan(
        docs, "apple", fields=[("title_tk", 2.0), ("body_tk", 1.0)],
        key_col="doc_id", k=10, chain="simple", tie=0.1, round_to=6,
    ).collect()
    got = {r["doc_id"]: r["score"] for r in out}
    # title field: dls [2,2,2,2] avgdl=2, df(apple)=2, n=4
    # body field: dls [5,4,3,5] avgdl=4.25, df(apple)=2, n=4
    st0 = 2.0 * _bm25(1, 2, 4, 2, 2.0)
    sb0 = 1.0 * _bm25(2, 2, 4, 5, 4.25)
    exp0 = max(st0, sb0) + 0.1 * (st0 + sb0 - max(st0, sb0))
    assert got[0] == pytest.approx(exp0, abs=1e-6)
    # doc 1: apple only in body
    sb1 = 1.0 * _bm25(1, 2, 4, 4, 4.25)
    assert got[1] == pytest.approx(sb1, abs=1e-6)
    # doc 3: apple only in title
    st3 = 2.0 * _bm25(1, 2, 4, 2, 2.0)
    assert got[3] == pytest.approx(st3, abs=1e-6)
    assert 2 not in got  # no query term anywhere


def test_dismax_tie_zero_is_pure_max(docs):
    out = bm25_dismax_topk_plan(
        docs, "apple", fields=[("title_tk", 2.0), ("body_tk", 1.0)],
        key_col="doc_id", k=10, chain="simple", tie=0.0, round_to=6,
    ).collect()
    got = {r["doc_id"]: r["score"] for r in out}
    st0 = 2.0 * _bm25(1, 2, 4, 2, 2.0)
    sb0 = 1.0 * _bm25(2, 2, 4, 5, 4.25)
    assert got[0] == pytest.approx(max(st0, sb0), abs=1e-6)


def test_dismax_multi_term_sums_per_term(docs):
    out = bm25_dismax_topk_plan(
        docs, "apple banana", fields=[("title_tk", 2.0), ("body_tk", 1.0)],
        key_col="doc_id", k=10, chain="simple", tie=0.1, round_to=6,
    ).collect()
    got = {r["doc_id"]: r["score"] for r in out}
    # doc 1 matches banana (title+body) and apple (body only)
    st1_ban = 2.0 * _bm25(1, 1, 4, 2, 2.0)
    sb1_ban = 1.0 * _bm25(1, 1, 4, 4, 4.25)
    ds_ban = max(st1_ban, sb1_ban) + 0.1 * min(st1_ban, sb1_ban)
    sb1_app = 1.0 * _bm25(1, 2, 4, 4, 4.25)
    assert got[1] == pytest.approx(ds_ban + sb1_app, abs=1e-6)


def test_dismax_empty_query(docs, spark):
    out = bm25_dismax_topk_plan(
        docs, "", fields=[("title_tk", 2.0)], key_col="doc_id", k=10,
        chain="simple",
    )
    assert out.count() == 0


# ---------------------------------------------------------------------------
# pf phrase-boost (test/solr/conf/solrconfig.xml:251-368 pf/ps)
# ---------------------------------------------------------------------------


def test_phrase_freq_counts(spark):
    from marc_solr_profiling_spark.operators.bm25 import phrase_freq_expr

    rows = [
        (0, "a b a b a b"),   # "a b" starts at 1,3,5 -> 3
        (1, "a x b a b"),     # exact adjacency once
        (2, "b a"),           # wrong order -> 0
        (3, "a"),             # too short -> 0
    ]
    df = spark.createDataFrame(rows, ["i", "t"]).select(
        "i", F.expr("split(t, ' ')").alias("tk")
    )
    got = {
        r["i"]: r["n"]
        for r in df.select(
            "i", phrase_freq_expr("tk", ["a", "b"]).alias("n")
        ).collect()
    }
    assert got == {0: 3, 1: 1, 2: 0, 3: 0}
    # slop=1: "a x b" matches from p0=1; doc1 counts starts 1 and 4
    got1 = {
        r["i"]: r["n"]
        for r in df.select(
            "i", phrase_freq_expr("tk", ["a", "b"], slop=1).alias("n")
        ).collect()
    }
    assert got1[1] == 2
    assert got1[2] == 0


def test_pf_boost_hand_computed(docs):
    """pf adds boost * idf_sum * BM25(ptf) in the pf field for docs
    containing the exact phrase; others keep the plain dismax score."""
    from marc_solr_profiling_spark.operators.bm25 import (
        bm25_dismax_pf_plan, bm25_dismax_topk_plan,
    )

    plain = {
        r["doc_id"]: r["score"]
        for r in bm25_dismax_topk_plan(
            docs, "apple pie",
            fields=[("title_tk", 2.0), ("body_tk", 1.0)],
            k=10, tie=0.1, round_to=6,
        ).collect()
    }
    boosted = {
        r["doc_id"]: r["score"]
        for r in bm25_dismax_pf_plan(
            docs, "apple pie",
            qf_fields=[("title_tk", 2.0), ("body_tk", 1.0)],
            pf_fields=[("body_tk", 5.0)],
            k=10, tie=0.1, round_to=6,
        ).collect()
    }
    # doc 0 body = "apple pie recipe with apple": phrase "apple pie" once
    # body stats: n_docs=4, dl0=5, avgdl=(5+4+3+5)/4; idf over body:
    # apple df=2, pie df=1
    import math as m
    avgdl = (5 + 4 + 3 + 5) / 4
    idf_sum = m.log((4 - 2 + 0.5) / (2 + 0.5) + 1.0) + m.log(
        (4 - 1 + 0.5) / (1 + 0.5) + 1.0
    )
    pb = 5.0 * idf_sum * 1 * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 5 / avgdl))
    assert boosted[0] == pytest.approx(plain[0] + pb, abs=2e-6)
    # docs without the phrase keep the plain score
    assert boosted[1] == pytest.approx(plain[1], abs=2e-6)
    assert boosted[3] == pytest.approx(plain[3], abs=2e-6)


def test_pf_only_boosts_main_matches(docs, spark):
    """pf is a boost, not a selector: a doc matching the phrase but not
    any query term cannot appear (impossible by construction), and the
    result set equals the main query's match set."""
    from marc_solr_profiling_spark.operators.bm25 import (
        bm25_dismax_pf_plan, bm25_dismax_topk_plan,
    )

    a = {r["doc_id"] for r in bm25_dismax_topk_plan(
        docs, "cherry", fields=[("body_tk", 1.0)], k=10).collect()}
    b = {r["doc_id"] for r in bm25_dismax_pf_plan(
        docs, "cherry", qf_fields=[("body_tk", 1.0)],
        pf_fields=[("body_tk", 9.0)], k=10).collect()}
    assert a == b == {2}
