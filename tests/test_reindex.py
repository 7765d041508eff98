"""Re-index / dry-run surface tests (plans/reindex.py) — the
SolrReIndexer round-trip the reference exercises against a live index
(SolrReIndexer.java:68-77: read stored -> re-extract -> add back) and the
MarcPrinter "index"-mode dry run (MarcPrinter.java:117-180)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from marc_solr_profiling_spark.corpus import generate_web_pages
from marc_solr_profiling_spark.plans.build import build_index
from marc_solr_profiling_spark.plans.reindex import (
    dry_run_extract, reextract_text_check, reindex_from_store,
)


def test_dry_run_extract_scalar_and_multivalued(spark):
    df = spark.createDataFrame(
        [("r1", "en", ["alpha", "beta"]), ("r2", None, [])],
        "record_id string, lang string, tokens array<string>",
    )
    out = dry_run_extract(
        df, {"lang": F.col("lang"), "tok": F.col("tokens")},
    ).collect()
    got = sorted((r["key"], r["field"], r["value"]) for r in out)
    # null lang emits nothing; each token is its own row
    assert got == [
        ("r1", "lang", "en"), ("r1", "tok", "alpha"), ("r1", "tok", "beta"),
    ]


def test_reextract_text_is_byte_identical_per_url(spark):
    """North-rule invariant: extraction over the stored html payload
    reproduces the stored text byte-for-byte, per url."""
    pages = generate_web_pages(spark, 80, seed=11, partitions=4)
    chk = reextract_text_check(pages, key_col="url")
    rows = chk.collect()
    assert len(rows) == 80
    assert all(r["identical"] for r in rows)


def test_reindex_from_store_equals_fresh_build(spark):
    """Re-indexing EVERY stored doc through the merge path yields an index
    whose dictionary, stats, and query results equal a fresh build (the
    spec-change-rebuild workflow SolrReIndexer exists for)."""
    docs = spark.createDataFrame(
        [(i, f"text word{i % 7} common shared token{i % 3}")
         for i in range(60)],
        "doc_id long, text string",
    )
    d_base = tempfile.mkdtemp(prefix="reidx_base_")
    d_re = tempfile.mkdtemp(prefix="reidx_out_")
    try:
        base = build_index(
            spark, docs, d_base, key_col="doc_id", id_col="doc_id",
            chain="simple", n_salts=4, block_size=16,
        )
        # stored-field view: the committed doc table joined back to text
        stored = base.docs.select("doc_id").join(docs, "doc_id")
        re_idx = reindex_from_store(
            spark, base, stored, d_re, id_col="doc_id",
            n_salts=4, block_size=16,
        )
        assert re_idx.n_docs == base.n_docs
        assert re_idx.avgdl == base.avgdl
        a = {(r["term"], r["df"], r["cf"])
             for r in base.dictionary.collect()}
        b = {(r["term"], r["df"], r["cf"])
             for r in re_idx.dictionary.collect()}
        assert a == b
        from marc_solr_profiling_spark.operators.wand import wand_topk

        qa = [(r["doc_id"], round(r["score"], 10))
              for r in wand_topk(base, "common word1", k=5,
                                 with_url=False).collect()]
        qb = [(r["doc_id"], round(r["score"], 10))
              for r in wand_topk(re_idx, "common word1", k=5,
                                 with_url=False).collect()]
        assert qa == qb
    finally:
        shutil.rmtree(d_base, ignore_errors=True)
        shutil.rmtree(d_re, ignore_errors=True)
