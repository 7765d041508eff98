"""End-to-end training-data pipeline (plans/pipeline.py): stage-gated
resumability, composition correctness against the individual verified
operators, and the full path including the fuzzy near-dup stage."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from marc_solr_profiling_spark.operators.dedup import (
    benchmark_decontaminate,
    fuzzy_dedup_keep,
)
from marc_solr_profiling_spark.plans.pipeline import build_training_data

from conftest import SF_DIR

GOPHER = dict(min_tokens=30, max_tokens=80, min_mean_word_len=4.4,
              max_mean_word_len=10.0, min_distinct_stopwords=2,
              max_punct_ratio=0.25, max_top2_frac=0.04, max_dup5_frac=0.0)


@pytest.fixture(scope="module")
def workdir():
    d = tempfile.mkdtemp(prefix="pipe_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "n_chars").persist()
    d.count()
    yield d
    d.unpersist()


def test_full_pipeline_with_fuzzy_composes(spark, workdir, docs):
    """Pipeline WITH the fuzzy stage == composing the standalone verified
    operators by hand, stage for stage."""
    bench = docs.filter(F.col("doc_id") % 41 == 0)
    fz = dict(n_hashes=16, bands=4, shingle_n=3, max_bucket=200,
              threshold=0.2)
    td = build_training_data(
        spark, docs, f"{workdir}/full", key_col="doc_id",
        weight_col="n_chars", stopwords=["the", "a"],
        gopher_thresholds=GOPHER, fuzzy=fz, benchmark=bench,
        decontam_n=5, decontam_max_hits=0, tokens_per_shard=50_000,
    )
    # hand-composed reference
    from marc_solr_profiling_spark.functions.textstats import (
        GOPHER_RULES,
        gopher_quality_flags,
    )

    winners = (docs.groupBy(F.md5("text").alias("h"))
               .agg(F.min("doc_id").alias("doc_id")).select("doc_id"))
    cur = docs.join(winners, "doc_id", "left_semi")
    flags = gopher_quality_flags(cur, key_col="doc_id",
                                 stopwords=["the", "a"], **GOPHER)
    rej = F.lit(False)
    for r in GOPHER_RULES:
        rej = rej | F.col(r)
    cur = cur.join(flags.filter(~rej).select("doc_id"), "doc_id",
                   "left_semi")
    kept = fuzzy_dedup_keep(cur, key_col="doc_id", **fz)
    cur = cur.join(kept.filter(F.col("kept")).select("doc_id"), "doc_id",
                   "left_semi")
    hits = benchmark_decontaminate(cur, bench, n=5)
    cur = cur.join(hits.filter(F.col("n_hit") <= 0).select("doc_id"),
                   "doc_id", "left_semi")
    want = {r["doc_id"] for r in cur.select("doc_id").collect()}
    got = {r["doc_id"] for r in td.survivors().collect()}
    assert got == want
    # card sanity: funnel is monotone non-increasing and ends at |got|
    card = sorted(
        ((r["stage_order"], r["stage"], r["n_in"], r["n_kept"])
         for r in td.card().collect()))
    kepts = [c[3] for c in card]
    assert kepts == sorted(kepts, reverse=True)
    assert card[0][2] == docs.count()
    assert kepts[-1] == len(got)
    # packed covers exactly the survivors
    packed = {r["doc_id"] for r in td.packed().collect()}
    assert packed == got


def test_kill_mid_pipeline_resumes_without_recompute(spark, workdir, docs,
                                                     monkeypatch):
    from marc_solr_profiling_spark.plans import lineage as lin

    bench = docs.filter(F.col("doc_id") % 41 == 0)
    kw = dict(key_col="doc_id", weight_col="n_chars",
              stopwords=["the", "a"], gopher_thresholds=GOPHER,
              fuzzy=None, benchmark=bench, decontam_n=5,
              decontam_max_hits=0, tokens_per_shard=50_000)
    ref = build_training_data(spark, docs, f"{workdir}/ref", **kw)

    out = f"{workdir}/resume"
    real_commit = lin.IndexStore.commit_stage

    def failing_commit(self, stage, df, **kwargs):
        if stage == "decontam" and self.path == out:
            raise RuntimeError("simulated kill mid-pipeline")
        return real_commit(self, stage, df, **kwargs)

    monkeypatch.setattr(lin.IndexStore, "commit_stage", failing_commit)
    with pytest.raises(RuntimeError, match="simulated kill"):
        build_training_data(spark, docs, out, **kw)
    monkeypatch.setattr(lin.IndexStore, "commit_stage", real_commit)

    m = lin.IndexStore(out)._read_manifest()
    assert "quality" in m["stages"] and "decontam" not in m["stages"]
    pre = {st: m["stages"][st]["committed_at"] for st in m["stages"]}

    td = build_training_data(spark, docs, out, **kw)
    m2 = td.store._read_manifest()
    for st, ts in pre.items():
        assert m2["stages"][st]["committed_at"] == ts, st
    got = sorted(map(tuple, td.packed().collect()))
    want = sorted(map(tuple, ref.packed().collect()))
    assert got == want
