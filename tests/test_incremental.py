"""Incremental index maintenance: upsert + delete deltas produce an index
whose query results are identical to a from-scratch build of the final doc
set (MarcMerger.java:251-364 semantics: mod wins, new inserted, deleted
dropped)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from marc_solr_profiling_spark.corpus import generate_web_pages
from marc_solr_profiling_spark.operators.wand import wand_topk
from marc_solr_profiling_spark.plans.build import build_index, incremental_update


@pytest.fixture(scope="module")
def workdir():
    d = tempfile.mkdtemp(prefix="incr_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _docs(spark, n=200):
    return (
        generate_web_pages(spark, n, seed=7, partitions=4)
        .withColumn("doc_id", F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long"))
        .select("doc_id", "url", "text")
    )


def test_incremental_equals_rebuild(spark, workdir):
    docs = _docs(spark, 200).persist()
    base = docs.filter("doc_id < 120")
    # delta: 80 new docs, 10 upserted (text replaced), 7 deleted
    new = docs.filter("doc_id >= 120")
    mods = docs.filter("doc_id < 120 AND doc_id % 13 = 0").withColumn(
        "text", F.concat(F.lit("fresh content entirely "), F.col("text"))
    )
    delta = new.unionByName(mods)
    dels = docs.filter("doc_id < 120 AND doc_id % 17 = 3").select("doc_id")

    base_idx = build_index(
        spark, base, f"{workdir}/base", key_col="url", id_col="doc_id",
        chain="text", n_salts=4, block_size=32,
    )
    idx = incremental_update(
        spark, base_idx, f"{workdir}/updated", delta_docs=delta,
        deleted_ids=dels, n_salts=4, block_size=32,
    )

    # equivalent final doc set, built from scratch
    del_ids = {r["doc_id"] for r in dels.collect()}
    mod_ids = {r["doc_id"] for r in mods.collect()}
    final = (
        docs.filter(~F.col("doc_id").isin(list(del_ids | mod_ids)))
        .unionByName(mods.filter(~F.col("doc_id").isin(list(del_ids))))
    )
    ref_idx = build_index(
        spark, final, f"{workdir}/rebuild", key_col="url", id_col="doc_id",
        chain="text", n_salts=4, block_size=32,
    )

    assert idx.n_docs == ref_idx.n_docs
    assert abs(idx.avgdl - ref_idx.avgdl) < 1e-9
    for q in ["the of and", "fresh content", "voyage", "time new said"]:
        got = [(r["doc_id"], round(r["score"], 9))
               for r in wand_topk(idx, q, k=10, with_url=False).collect()]
        want = [(r["doc_id"], round(r["score"], 9))
                for r in wand_topk(ref_idx, q, k=10, with_url=False).collect()]
        assert got == want, q
    # deleted docs never surface
    deleted_hits = {d for d, _ in got} & del_ids
    assert not deleted_hits


def test_kill_mid_build_resumes_without_recompute(spark, workdir, monkeypatch):
    """Kill-mid-build resume (north-rule criterion): abort a build AFTER the
    tf stage commits but BEFORE the segments stage commits, re-run
    ``build_index``, and assert via lineage rows that tf/stats/docs are NOT
    recomputed and that the resumed index is identical (rows and query
    results) to an uninterrupted build of the same input.

    Reference analog: the per-id-range indexing scripts restart from the
    last completed range (core/src/org/solrmarc/marc/MarcImporter.java
    commit handling); here the unit of resume is the committed stage
    snapshot (plans/lineage.py)."""
    from marc_solr_profiling_spark.plans import lineage as lin

    docs = _docs(spark, 150).persist()
    kw = dict(key_col="url", id_col="doc_id", chain="text",
              n_salts=4, block_size=32)

    # uninterrupted reference build
    ref_idx = build_index(spark, docs, f"{workdir}/kill_ref", **kw)

    # interrupted build: raise inside the segments commit (simulated driver
    # loss between the tf barrier and the segment shuffle's sink)
    out = f"{workdir}/kill_resume"
    real_commit = lin.IndexStore.commit_stage

    def failing_commit(self, stage, df, **kwargs):
        if stage == "segments":
            raise RuntimeError("simulated kill mid-build")
        return real_commit(self, stage, df, **kwargs)

    monkeypatch.setattr(lin.IndexStore, "commit_stage", failing_commit)
    with pytest.raises(RuntimeError, match="simulated kill"):
        build_index(spark, docs, out, **kw)
    monkeypatch.setattr(lin.IndexStore, "commit_stage", real_commit)

    m_aborted = lin.IndexStore(out)._read_manifest()
    assert "tf" in m_aborted["stages"], "tf must be committed before the kill"
    assert "segments" not in m_aborted["stages"]
    pre = {st: m_aborted["stages"][st]["committed_at"]
           for st in m_aborted["stages"]}

    # resume: completed stages must be skipped (identical committed_at),
    # only segments + dictionary run
    idx = build_index(spark, docs, out, **kw)
    m_resumed = idx.store._read_manifest()
    for st, ts in pre.items():
        assert m_resumed["stages"][st]["committed_at"] == ts, (
            f"stage {st} was recomputed on resume")
    assert "segments" in m_resumed["stages"]

    # resumed index identical to the uninterrupted build: every stage
    # table row-identical, and query results rank- and score-identical
    for st in ["docs", "stats", "dictionary", "segments"]:
        got = sorted(map(tuple, idx.store.read_stage(spark, st).collect()))
        want = sorted(map(tuple,
                          ref_idx.store.read_stage(spark, st).collect()))
        assert got == want, f"stage {st} differs after resume"
    for q in ["the of and", "voyage time", "new said"]:
        got = [(r["doc_id"], round(r["score"], 9))
               for r in wand_topk(idx, q, k=10, with_url=False).collect()]
        want = [(r["doc_id"], round(r["score"], 9))
                for r in wand_topk(ref_idx, q, k=10, with_url=False).collect()]
        assert got == want, q
    docs.unpersist()


def test_incremental_is_resumable(spark, workdir):
    docs = _docs(spark, 80)
    base_idx = build_index(
        spark, docs.filter("doc_id < 50"), f"{workdir}/rbase",
        key_col="url", id_col="doc_id", chain="text", n_salts=4, block_size=32,
    )
    out = f"{workdir}/rupd"
    idx1 = incremental_update(
        spark, base_idx, out, delta_docs=docs.filter("doc_id >= 50"),
        n_salts=4, block_size=32,
    )
    m1 = idx1.store._read_manifest()
    # second call with identical config: every stage is already committed
    idx2 = incremental_update(
        spark, base_idx, out, delta_docs=docs.filter("doc_id >= 50"),
        n_salts=4, block_size=32,
    )
    m2 = idx2.store._read_manifest()
    assert m1["stages"].keys() == m2["stages"].keys()
    for st in m1["stages"]:
        assert m1["stages"][st]["committed_at"] == m2["stages"][st]["committed_at"]
