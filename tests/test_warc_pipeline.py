"""Raw crawl to query: WARC files on disk -> build_index_from_warc ->
BM25 top-k identical to an index built from the same pages as a table.
The full north-star path (container -> extraction -> index -> query) in
one test module."""
from __future__ import annotations

import pytest

from marc_solr_profiling_spark.corpus import generate_query_set, generate_web_pages
from marc_solr_profiling_spark.operators.wand import wand_topk
from marc_solr_profiling_spark.plans.build import build_index, build_index_from_warc
from marc_solr_profiling_spark.sources.warc import write_warc_files

N_DOCS = 200


@pytest.fixture(scope="module")
def indexes(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("warc_pipe")
    pages = generate_web_pages(spark, N_DOCS, seed=42, partitions=4).cache()
    pages.count()
    write_warc_files(pages, str(root / "crawl"))
    kw = dict(n_salts=4, block_size=32)
    from_warc = build_index_from_warc(
        spark, str(root / "crawl"), str(root / "idx_warc"), **kw)
    from_table = build_index(
        spark, pages, str(root / "idx_table"), html_col="html", **kw)
    pages.unpersist()
    return from_warc, from_table


def test_stats_identical(indexes):
    from_warc, from_table = indexes
    assert (from_warc.n_docs, from_warc.avgdl) == (
        from_table.n_docs, from_table.avgdl)


@pytest.mark.parametrize("qid", [0, 1, 2, 7, 12])
def test_topk_rank_identical(indexes, qid):
    from_warc, from_table = indexes
    q = generate_query_set(20, seed=42)[qid]
    a = [(r.doc_id, round(r.score, 9))
         for r in wand_topk(from_warc, q, k=10, with_url=False).collect()]
    b = [(r.doc_id, round(r.score, 9))
         for r in wand_topk(from_table, q, k=10, with_url=False).collect()]
    assert a == b


def test_dictionary_identical(indexes):
    from_warc, from_table = indexes
    a = from_warc.cached_dictionary().orderBy("term").collect()
    b = from_table.cached_dictionary().orderBy("term").collect()
    assert a == b
