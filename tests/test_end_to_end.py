"""M1 end-to-end: corpus -> HTML extraction (byte-identity) -> logical index
-> BM25 top-k rank-identical to the pure-Python oracle.

The analog of the reference's live-Solr end-to-end tier
(``core/test/src/org/solrmarc/testUtils/IndexTest.java:117-155,339``), with
the pure-Python OracleIndex standing in for Jetty+Solr.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from marc_solr_profiling_spark.corpus import generate_query_set, generate_web_pages
from marc_solr_profiling_spark.operators.bm25 import (
    bm25_score_all,
    bm25_topk,
    query_term_weights,
)
from marc_solr_profiling_spark.operators.postings import build_logical_index
from marc_solr_profiling_spark.oracle import OracleIndex
from marc_solr_profiling_spark.sources.html import extract_text_udf

N_DOCS = 300


@pytest.fixture(scope="module")
def pages(spark):
    df = generate_web_pages(spark, N_DOCS, seed=42, partitions=4).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def local_docs(pages):
    rows = pages.select("url", "text").collect()
    return [(r["url"], r["text"]) for r in rows]


def test_corpus_deterministic_across_parallelism(spark):
    a = generate_web_pages(spark, 50, seed=42, partitions=1).select("url", "text")
    b = generate_web_pages(spark, 50, seed=42, partitions=7).select("url", "text")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_html_extraction_byte_identical(pages):
    """North-rule invariant: extracted text == original text, per url,
    byte-for-byte — including empty and whitespace-only docs."""
    extracted = pages.withColumn("extracted", extract_text_udf()(F.col("html")))
    bad = extracted.filter(
        ~F.col("extracted").eqNullSafe(F.col("text"))
    ).select("url", "text", "extracted")
    rows = bad.collect()
    assert rows == [], f"extraction mismatch for {len(rows)} urls: {rows[:3]}"


@pytest.fixture(scope="module")
def spark_index(pages):
    tf, ds, cs, dfreq = build_logical_index(pages, key_col="url", chain="text")
    tf = tf.cache()
    ds = ds.cache()
    stats = cs.collect()[0]
    df_map = {r["term"]: r["df"] for r in dfreq.collect()}
    return tf, ds, int(stats["n_docs"]), float(stats["avgdl"]), df_map


@pytest.fixture(scope="module")
def oracle_index(local_docs):
    return OracleIndex(local_docs, chain="text")


def test_collection_stats_match_oracle(spark_index, oracle_index):
    _, _, n_docs, avgdl, df_map = spark_index
    assert n_docs == oracle_index.n_docs
    assert avgdl == pytest.approx(oracle_index.avgdl, rel=1e-12)
    oracle_df = {t: len(p) for t, p in oracle_index.postings.items()}
    assert df_map == oracle_df


@pytest.mark.parametrize("qid", range(0, 50, 7))
def test_bm25_full_scores_match_oracle(spark_index, oracle_index, qid):
    tf, ds, n_docs, avgdl, df_map = spark_index
    query = generate_query_set(50, seed=42)[qid]
    qtw = query_term_weights(tf.sparkSession, query, df_map, n_docs, chain="text")
    got = {
        r["url"]: r["score"]
        for r in bm25_score_all(tf, ds, n_docs, avgdl, qtw).collect()
    }
    want = oracle_index.score_query(query)
    assert set(got) == set(want)
    for url, score in want.items():
        assert got[url] == pytest.approx(score, rel=1e-9), url


def test_bm25_topk_rank_identical(spark_index, oracle_index):
    tf, ds, n_docs, avgdl, df_map = spark_index
    queries = generate_query_set(50, seed=42)
    for q in queries[:20]:
        qtw = query_term_weights(tf.sparkSession, q, df_map, n_docs, chain="text")
        got = [
            (r["url"], r["score"])
            for r in bm25_topk(tf, ds, n_docs, avgdl, qtw, k=10).collect()
        ]
        want = oracle_index.topk(q, k=10)
        assert [u for u, _ in got] == [u for u, _ in want], f"rank mismatch q={q!r}"
        for (gu, gs), (wu, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-9)


def test_absent_term_returns_empty(spark_index):
    tf, ds, n_docs, avgdl, df_map = spark_index
    qtw = query_term_weights(tf.sparkSession, "zzzqqqxxx", df_map, n_docs)
    assert qtw == []
    assert bm25_topk(tf, ds, n_docs, avgdl, qtw, k=10).count() == 0
