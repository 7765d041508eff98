"""queryResultCache serving layer (operators/resultcache.py): window
pages served from one kernel run, LRU eviction, deep-page re-expansion,
searcher-scoped invalidation via autowarm."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from marc_solr_profiling_spark.operators import resultcache as rc
from marc_solr_profiling_spark.operators.wand import wand_topk
from marc_solr_profiling_spark.plans.build import build_index

from conftest import SF_DIR

Q = "spark merge window stream"


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return build_index(
        spark, docs, str(tmp_path_factory.mktemp("rcidx") / "i"),
        key_col="doc_id", id_col="doc_id", chain="simple",
        n_salts=4, block_size=32,
    )


def test_pages_inside_window_are_one_fetch(spark, idx, monkeypatch):
    s = rc.CachedSearcher(idx, size=8, window=40)
    calls = []
    real = wand_topk

    def counting(*a, **kw):
        calls.append(kw.get("k"))
        return real(*a, **kw)

    monkeypatch.setattr("marc_solr_profiling_spark.operators.wand.wand_topk",
                        counting)
    p1 = s.search(Q, 0, 10)
    p2 = s.search(Q, 10, 10)
    p3 = s.search(Q, 20, 10)
    assert len(calls) == 1 and calls[0] == 40
    assert s.stats.hits == 2 and s.stats.misses == 1
    # pages agree with a direct top-30 (scores rounded: decode order
    # differs by fp-association ulps between different-k runs)
    want = [(r["doc_id"], round(r["score"], 6))
            for r in real(idx, Q, k=30, with_url=False).collect()]
    assert [(d, round(s, 6)) for d, s in p1 + p2 + p3] == want


def test_deep_page_expands_window(spark, idx, monkeypatch):
    s = rc.CachedSearcher(idx, size=8, window=20)
    calls = []
    real = wand_topk

    def counting(*a, **kw):
        calls.append(kw.get("k"))
        return real(*a, **kw)

    monkeypatch.setattr("marc_solr_profiling_spark.operators.wand.wand_topk",
                        counting)
    s.search(Q, 0, 10)           # fetch k=20
    deep = s.search(Q, 50, 10)   # past window -> k=60 refetch
    assert calls == [20, 60]
    want = [(r["doc_id"], round(r["score"], 6))
            for r in real(idx, Q, k=60, with_url=False).collect()]
    assert [(d, round(s, 6)) for d, s in deep] == want[50:60]
    # and now the bigger window serves shallower pages from cache
    s.search(Q, 30, 10)
    assert calls == [20, 60]


def test_lru_eviction_and_distinct_keys(spark, idx):
    s = rc.CachedSearcher(idx, size=2, window=10)
    s.search("spark", 0, 5)
    s.search("merge", 0, 5)
    s.search("stream", 0, 5)     # evicts "spark"
    assert s.stats.evictions == 1
    assert len(s._lru) == 2
    # mm changes the key
    s2 = rc.CachedSearcher(idx, size=8, window=10)
    s2.search(Q, 0, 5, min_match=1)
    b = s2.search(Q, 0, 5, min_match=4)
    assert s2.stats.misses == 2  # distinct cache keys per mm
    want = [(r["doc_id"], round(r["score"], 6))
            for r in wand_topk(idx, Q, k=10, with_url=False,
                               min_match=4).collect()][:5]
    assert [(d, round(s, 6)) for d, s in b] == want


def test_exhausted_short_results_never_refetch(spark, idx, monkeypatch):
    s = rc.CachedSearcher(idx, size=8, window=500)
    calls = []
    real = wand_topk

    def counting(*a, **kw):
        calls.append(kw.get("k"))
        return real(*a, **kw)

    monkeypatch.setattr("marc_solr_profiling_spark.operators.wand.wand_topk",
                        counting)
    first = s.search("zzzznope spark", 0, 10)
    s.search("zzzznope spark", 400, 50)  # beyond matches: exhausted hit
    assert len(calls) == 1
    assert s.stats.hits == 1
    assert first  # 'spark' matches something


def test_autowarm_new_searcher(spark, idx, monkeypatch):
    old = rc.CachedSearcher(idx, size=8, window=10)
    old.search(Q, 0, 5)
    old.search("voyage", 0, 5)
    new = rc.CachedSearcher(idx, size=8, window=10).warm(old)
    assert new.stats.misses == 2
    new.search(Q, 0, 5)
    assert new.stats.hits == 1
