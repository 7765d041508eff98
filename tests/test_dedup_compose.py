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


# -------------------------------------------------- connected components

def _uf_components(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-label per node
    return {n: find(n) for n in parent}


def test_connected_components_matches_union_find(spark):
    import random

    from marc_solr_profiling_spark.operators.dedup import connected_components

    rng = random.Random(42)
    nodes = list(range(100))
    pairs = set()
    # several cliques + random edges + an 8-node chain (multi-round case)
    for base in (0, 20, 40):
        clique = nodes[base:base + 5]
        pairs |= {(a, b) for a in clique for b in clique if a < b}
    for _ in range(30):
        a, b = rng.sample(nodes, 2)
        pairs.add((min(a, b), max(a, b)))
    chain = [90, 91, 92, 93, 94, 95, 96, 97]
    pairs |= {(chain[i], chain[i + 1]) for i in range(len(chain) - 1)}

    df = spark.createDataFrame(sorted(pairs), "key_a long, key_b long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(df).collect()
    }
    want = _uf_components(pairs)
    assert got == want
    # canonical-representative invariant: every cluster id is a member
    # of its own cluster and the minimum of it
    for node, lab in got.items():
        assert got[lab] == lab and lab <= node


def test_connected_components_single_pair(spark):
    from marc_solr_profiling_spark.operators.dedup import connected_components

    df = spark.createDataFrame([(7, 3)], "key_a long, key_b long")
    got = {r["doc_id"]: r["cluster_id"]
           for r in connected_components(df).collect()}
    assert got == {3: 3, 7: 3}


def test_benchmark_decontaminate(spark):
    """Known-overlap fixture: doc 1 contains the benchmark sentence
    verbatim (all its 3-grams hit), doc 2 shares a partial window, doc 3
    is clean, empty doc absent from output."""
    from marc_solr_profiling_spark.operators.dedup import (
        benchmark_decontaminate,
    )

    bench = spark.createDataFrame(
        [("the quick brown fox jumps",)], "text string")
    docs = spark.createDataFrame(
        [
            (1, "intro the quick brown fox jumps outro"),
            (2, "a quick brown fox sat still here today"),  # shares 1 3-gram
            (3, "completely different words entirely present"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           benchmark_decontaminate(docs, bench, n=3).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].contaminated and out[1].n_hit == 3  # all bench 3-grams
    assert out[2].contaminated and out[2].n_hit == 1  # 'quick brown fox'
    assert not out[3].contaminated and out[3].n_hit == 0
    # n_grams is the distinct shingle count: len(toks) - 2
    assert out[1].n_grams == 5 and out[3].n_grams == 3


def test_minhash_xxhash_variant_finds_same_dups(spark):
    """The xxhash64 production variant is a valid min-hash family: on a
    corpus with injected exact duplicates, banded LSH over either hash
    implementation must surface every (original, copy) pair — identical
    signatures for identical shingle sets, regardless of family."""
    from pyspark.sql import functions as F

    from marc_solr_profiling_spark.operators.dedup import (
        minhash_lsh_candidates,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").select("doc_id", "text")
    dup = docs.filter(F.col("doc_id") % 100 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    aug = docs.unionByName(dup)
    want = {(r.doc_id, r.doc_id + 1_000_000)
            for r in dup.select((F.col("doc_id") - 1_000_000)
                                .alias("doc_id")).collect()}
    for impl in ("md5", "fast64"):
        pairs = {(r.key_a, r.key_b) for r in minhash_lsh_candidates(
            aug, hash_impl=impl).collect()}
        assert want <= pairs, impl
