"""Incremental cross-snapshot dedup (dedup.py:dedup_against) — new
crawl flagged against an existing corpus via its stored LSH band table.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from marc_solr_profiling_spark.operators.dedup import (
    dedup_against, minhash_band_table, minhash_lsh_candidates)

OLD_ROWS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "stock market quarterly earnings report for the fiscal year "
        "with strong revenue growth across all segments"),
    (3, "an entirely different document about gardening and flowers"),
]
NEW_ROWS = [
    (101, "the quick brown fox jumps over the lazy dog again and again"),
    (102, "a brand new document with completely fresh content inside"),
    (103, ""),
    # one-word variant of old doc 2: jaccard 0.87, band-collides with
    # the md5 signature family (verified by construction)
    (104, "stock market quarterly earnings report for the fiscal year "
          "with strong revenue growth across all regions"),
]


@pytest.fixture(scope="module")
def corpora(spark):
    old = spark.createDataFrame(OLD_ROWS, "doc_id long, text string")
    new = spark.createDataFrame(NEW_ROWS, "doc_id long, text string")
    return old, new


def test_exact_copy_flagged_unique_kept(corpora):
    old, new = corpora
    out = {r["doc_id"]: r for r in dedup_against(new, old).collect()}
    assert len(out) == 4  # every new doc gets a row
    assert not out[101]["kept"] and out[101]["dup_of"] == 1
    assert out[101]["n_dups"] >= 1
    assert out[102]["kept"] and out[102]["dup_of"] is None
    assert out[102]["n_dups"] == 0
    # empty text: no signature, no candidates -> kept
    assert out[103]["kept"]
    # near-copy (one word differs): high jaccard, flagged
    assert not out[104]["kept"] and out[104]["dup_of"] == 2


def test_threshold_gates_near_match(corpora):
    old, new = corpora
    strict = {r["doc_id"]: r["kept"]
              for r in dedup_against(new, old, threshold=0.999).collect()}
    # the exact copy survives threshold 0.999; the near-copy does not match
    assert not strict[101]
    assert strict[104]


def test_precomputed_band_table_identical(corpora):
    old, new = corpora
    ob = minhash_band_table(old)
    direct = sorted(tuple(r) for r in dedup_against(new, old).collect())
    stored = sorted(tuple(r) for r in
                    dedup_against(new, old, old_bands=ob).collect())
    assert direct == stored


def test_band_table_matches_self_join_candidates(spark):
    """minhash_band_table split across a corpus must reproduce
    minhash_lsh_candidates' pair set when rejoined — the band table is
    the same index, factored for storage."""
    rows = OLD_ROWS + [(r + 10, t) for r, t in OLD_ROWS]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ref = {tuple(r) for r in minhash_lsh_candidates(docs).collect()}
    bt = minhash_band_table(docs)
    a = bt.select("band", "bucket", F.col("doc_id").alias("key_a"))
    b = bt.select("band", "bucket", F.col("doc_id").alias("key_b"))
    got = {tuple(r) for r in
           a.join(b, ["band", "bucket"])
           .filter(F.col("key_a") < F.col("key_b"))
           .select("key_a", "key_b").distinct().collect()}
    assert got == ref


def test_old_side_mega_bucket_cap(spark):
    """A boilerplate bucket bigger than max_bucket on the OLD side is
    dropped: the colliding new doc stays kept."""
    boiler = "identical boilerplate page body repeated verbatim here"
    old = spark.createDataFrame(
        [(i, boiler) for i in range(30)], "doc_id long, text string")
    new = spark.createDataFrame([(500, boiler)], "doc_id long, text string")
    flagged = dedup_against(new, old, max_bucket=200).collect()[0]
    assert not flagged["kept"]
    capped = dedup_against(new, old, max_bucket=10).collect()[0]
    assert capped["kept"]
