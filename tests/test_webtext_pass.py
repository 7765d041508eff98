"""The fused tokenize-once webtext pass (functions/webtext_pass.py) must
equal every standalone operator it replaces, column group by column
group, on the same corpus — the differential contract that lets the
fused pass be the scale path while the standalone operators keep the
oracle contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from marc_solr_profiling_spark.corpus import generate_web_pages
from marc_solr_profiling_spark.functions.lm import ccnet_perplexity
from marc_solr_profiling_spark.functions.textstats import (
    gopher_quality_flags,
    repetition_signals,
)
from marc_solr_profiling_spark.functions.webtext_pass import webtext_signals
from marc_solr_profiling_spark.operators.dedup import (
    benchmark_decontaminate,
    minhash_signatures,
)

N_HASHES = 8


@pytest.fixture(scope="module")
def corpus(spark):
    docs = (
        generate_web_pages(spark, 300, seed=11, partitions=4)
        .withColumn("doc_id",
                    F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long"))
        .select("doc_id", "text")
    )
    # inject short/degenerate docs to exercise the fallback paths
    extra = spark.createDataFrame(
        [(9001, "word"), (9002, "a a a a a a a a"), (9003, "x y"),
         (9004, "!!! ??? ..."), (9005, "the the the the the")],
        "doc_id long, text string",
    )
    return docs.unionByName(extra).persist()


@pytest.fixture(scope="module")
def fused(spark, corpus):
    bench = corpus.filter("doc_id % 41 = 0")
    ref = corpus.filter("doc_id % 7 = 0")
    return webtext_signals(
        corpus, n_hashes=N_HASHES, bench_docs=bench, ref_docs=ref,
        nb_pos_docs=corpus.filter("doc_id % 7 = 0"),
        nb_neg_docs=corpus.filter("doc_id % 7 = 1"),
    ).persist()


def _by_key(df, cols):
    return {r["doc_id"]: tuple(r[c] for c in cols) for r in df.collect()}


def test_repetition_group_matches(spark, corpus, fused):
    cols = ["n_tokens", "ttr", "top2_frac", "dup5_frac"]
    want = _by_key(repetition_signals(corpus), cols)
    got = _by_key(fused.select("doc_id", *cols), cols)
    assert got == want


def test_gopher_group_matches(spark, corpus, fused):
    from marc_solr_profiling_spark.functions.textstats import GOPHER_RULES

    flags = gopher_quality_flags(corpus)
    want = _by_key(flags, GOPHER_RULES)
    got = _by_key(fused.select("doc_id", *GOPHER_RULES), GOPHER_RULES)
    # the standalone keeps zero-token docs; the fused pass drops them
    # (the shared >=1-token rule) — compare on the fused key set
    want = {k: v for k, v in want.items() if k in got}
    assert got == want


def test_minhash_group_matches(spark, corpus, fused):
    cols = [f"h{i}" for i in range(N_HASHES)]
    want = _by_key(
        minhash_signatures(corpus, n_hashes=N_HASHES, shingle_n=3,
                           hash_impl="fast64"), cols)
    got = _by_key(fused.select("doc_id", *cols), cols)
    assert got == want


def test_decontaminate_group_matches(spark, corpus, fused):
    bench = corpus.filter("doc_id % 41 = 0")
    cols = ["n_grams", "n_hit", "contaminated"]
    want = _by_key(benchmark_decontaminate(corpus, bench, n=8), cols)
    got = _by_key(fused.select("doc_id", *cols), cols)
    assert got == want
    # the injected duplicates guarantee the probe is non-vacuous
    assert any(v[2] for v in got.values())


def test_lm_group_matches(spark, corpus, fused):
    ref = corpus.filter("doc_id % 7 = 0")
    cols = ["n_bigrams", "ppl"]
    want = _by_key(ccnet_perplexity(corpus, ref), cols)
    got = _by_key(
        fused.filter("n_bigrams >= 1").select("doc_id", *cols), cols)
    assert got == want


def test_lm_absent_without_ref(spark, corpus):
    out = webtext_signals(corpus.limit(20), n_hashes=2)
    rows = out.collect()
    assert all(r["ppl"] is None for r in rows)
    assert all(r["contaminated"] is None for r in rows)


def test_nb_quality_group_matches(spark, corpus, fused):
    from marc_solr_profiling_spark.functions.quality_classifier import (
        nb_quality_score,
    )

    want = _by_key(
        nb_quality_score(
            corpus,
            corpus.filter("doc_id % 7 = 0"),
            corpus.filter("doc_id % 7 = 1"),
        ).select("doc_id", "nb_logratio", F.col("keep").alias("nb_keep")),
        ["nb_logratio", "nb_keep"],
    )
    got = _by_key(fused.select("doc_id", "nb_logratio", "nb_keep"),
                  ["nb_logratio", "nb_keep"])
    assert got == want


def test_nb_columns_null_without_seeds(spark, corpus):
    out = webtext_signals(
        corpus.limit(5), n_hashes=2,
    ).select("nb_logratio", "nb_keep").collect()
    assert all(r["nb_logratio"] is None and r["nb_keep"] is None
               for r in out)
