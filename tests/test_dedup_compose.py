"""LSH->exact-Jaccard composition + BPE-ish token counting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from marc_solr_profiling_spark.functions.textstats import bpe_token_count
from marc_solr_profiling_spark.operators.dedup import (
    lsh_jaccard_pairs,
    ngram_jaccard_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog again and again"),
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "a completely different document about spark query planning"),
    (3, "the quick brown fox jumps over the lazy cat again and again"),
    (4, "unrelated text with nothing shared at all here today"),
]


def test_lsh_jaccard_finds_exact_duplicate(spark):
    out = lsh_jaccard_pairs(_docs(spark, CORPUS), threshold=0.5).collect()
    pairs = {(r["key_a"], r["key_b"]): r["jaccard"] for r in out}
    assert pairs[(0, 1)] == pytest.approx(1.0)
    assert all(a < b for a, b in pairs)


def test_lsh_jaccard_subset_of_exact_pairs(spark):
    """Every LSH-verified pair is an exact-Jaccard pair with the SAME
    jaccard value (verification is exact; only candidate generation is
    approximate)."""
    docs = _docs(spark, CORPUS)
    lsh = {(r["key_a"], r["key_b"]): r["jaccard"]
           for r in lsh_jaccard_pairs(docs, threshold=0.2).collect()}
    exact = {(r["key_a"], r["key_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, threshold=0.2).collect()}
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert v == pytest.approx(exact[k])
    assert (0, 1) in lsh  # identical docs always collide in every band


def test_simhash_band_candidates_identical_docs(spark):
    from marc_solr_profiling_spark.operators.dedup import (
        simhash_band_candidates,
    )

    out = simhash_band_candidates(
        _docs(spark, CORPUS), bits=32, bands=4, max_hamming=3
    ).collect()
    pairs = {(r["key_a"], r["key_b"]): r["hamming"] for r in out}
    assert pairs[(0, 1)] == 0  # identical text -> identical simhash
    # 4 (unrelated) must not be Hamming-near doc 0
    assert (0, 4) not in pairs


def test_bpe_token_count_matches_hand_count(spark):
    rows = [
        (0, "it's fine"),     # it | 's | ' fine' -> 3
        (1, "hello world"),   # hello | ' world' -> 2
        (2, "a1b2"),          # a | 1 | b | 2 -> 4
        (3, "don't stop!!"),  # don | 't | ' stop' | !! -> 4
        (4, ""),              # -> 0
    ]
    out = {
        r["doc_id"]: r["n"]
        for r in _docs(spark, rows)
        .select("doc_id", bpe_token_count("text").alias("n"))
        .collect()
    }
    assert out == {0: 3, 1: 2, 2: 4, 3: 4, 4: 0}
