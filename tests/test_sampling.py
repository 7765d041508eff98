"""Splitting/sampling/sharding: determinism, stability-under-growth, the
mT5 temperature math against a numpy reference, and the two-phase
distributed prefix sum against a serial one."""
from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from marc_solr_profiling_spark.operators.sampling import (
    frac_to_hex8,
    hash_split,
    pack_shards,
    stratified_sample,
    temperature_rebalance_plan,
)


def _ids(spark, n):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_hash_split_fractions_and_disjoint(spark):
    out = hash_split(_ids(spark, 20000)).groupBy("split").count().collect()
    got = {r["split"]: r["count"] for r in out}
    assert set(got) == {"train", "val", "test"}
    assert sum(got.values()) == 20000
    assert got["train"] == pytest.approx(18000, rel=0.02)
    assert got["val"] == pytest.approx(1000, rel=0.15)
    assert got["test"] == pytest.approx(1000, rel=0.15)


def test_hash_split_stable_under_corpus_growth(spark):
    """THE property: a doc's split never changes when the corpus grows."""
    small = {r.doc_id: r.split
             for r in hash_split(_ids(spark, 1000)).collect()}
    big = {r.doc_id: r.split
           for r in hash_split(_ids(spark, 5000)).collect()}
    assert all(big[k] == v for k, v in small.items())


def test_hash_split_matches_reference_hash(spark):
    """Assignment is exactly the md5-prefix rule (engine-portable)."""
    rows = hash_split(_ids(spark, 500)).collect()
    t_val = frac_to_hex8(0.9)
    t_test = frac_to_hex8(0.95)
    for r in rows:
        h = hashlib.md5(f"split{r.doc_id}".encode()).hexdigest()[:8]
        want = ("train" if h < t_val else "val" if h < t_test else "test")
        assert r.split == want


def test_stratified_sample_per_stratum(spark):
    docs = spark.range(30000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"))
    kept = stratified_sample(
        docs, {"en": 0.5, "de": 0.05}).groupBy("lang").count().collect()
    got = {r.lang: r["count"] for r in kept}
    assert got["en"] == pytest.approx(5000, rel=0.05)
    assert got["de"] == pytest.approx(1000, rel=0.15)
    # default_frac=0 drops unknown strata entirely
    docs2 = docs.withColumn("lang", F.lit("xx"))
    assert stratified_sample(docs2, {"en": 0.5}).count() == 0


def test_temperature_rebalance_matches_reference(spark):
    counts = {"en": 8000, "de": 1500, "fr": 500}
    rows = []
    for lang, n in counts.items():
        rows += [(i, lang) for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    alpha = 0.3
    got = {r.stratum: r for r in
           temperature_rebalance_plan(docs, alpha=alpha).collect()}

    tot = sum(counts.values())
    p = {k: v / tot for k, v in counts.items()}
    q_raw = {k: v ** alpha for k, v in p.items()}
    qs = sum(q_raw.values())
    mix = {k: v / qs for k, v in q_raw.items()}
    ratio = {k: mix[k] / p[k] for k in p}
    rmax = max(ratio.values())
    for k in counts:
        assert got[k].n_docs == counts[k]
        assert got[k].share == pytest.approx(p[k], abs=1e-6)
        assert got[k].mix_weight == pytest.approx(mix[k], abs=1e-6)
        assert got[k].keep_prob == pytest.approx(ratio[k] / rmax, abs=1e-6)
    # alpha<1 up-weights the tail: rarest language keeps everything
    assert got["fr"].keep_prob == 1.0
    assert got["en"].keep_prob < got["de"].keep_prob < 1.0


@pytest.mark.parametrize("parts", [1, 3, 8])
def test_pack_shards_matches_serial_prefix_sum(spark, parts):
    rng = np.random.default_rng(7)
    w = rng.integers(10, 500, 1000)
    docs = spark.createDataFrame(
        [(int(i), int(t)) for i, t in enumerate(w)],
        "doc_id long, n_tokens long")
    got = {r.doc_id: r.shard_id for r in
           pack_shards(docs, 2048, partitions=parts).collect()}
    start = np.concatenate([[0], w.cumsum()[:-1]])
    want = start // 2048
    assert len(got) == 1000
    assert all(got[i] == want[i] for i in range(1000))


def test_pack_shards_budget_held(spark):
    docs = spark.createDataFrame(
        [(i, 100) for i in range(100)], "doc_id long, n_tokens long")
    out = pack_shards(docs, 1000, partitions=4)
    sizes = {r.shard_id: r["sum(n_tokens)"] for r in
             out.groupBy("shard_id").sum("n_tokens").collect()}
    assert sizes == {i: 1000 for i in range(10)}


# --- global_shuffle (deterministic training-order shuffle) ---------------

def test_global_shuffle_matches_serial_rank(spark):
    import hashlib

    from marc_solr_profiling_spark.operators.sampling import global_shuffle

    docs = spark.createDataFrame(
        [(i,) for i in range(500)], "doc_id long")
    got = {r.doc_id: (r.shuffle_key, r.shuffle_rank)
           for r in global_shuffle(docs, seed="s7", partitions=8).collect()}
    want = sorted(
        (hashlib.md5(f"s7:{i}".encode()).hexdigest(), i) for i in range(500))
    assert len(got) == 500
    for rank, (h, i) in enumerate(want):
        assert got[i] == (h, rank)


def test_global_shuffle_partition_invariant_and_seeded(spark):
    from marc_solr_profiling_spark.operators.sampling import global_shuffle

    docs = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    base = sorted(tuple(r) for r in
                  global_shuffle(docs, seed="a", partitions=1).collect())
    for parts in (3, 8):
        again = sorted(tuple(r) for r in
                       global_shuffle(docs, seed="a",
                                      partitions=parts).collect())
        assert again == base
    other = sorted(tuple(r) for r in
                   global_shuffle(docs, seed="b", partitions=8).collect())
    assert other != base
    # dense 0-based ranks either way
    assert sorted(r[2] for r in other) == list(range(200))


# --- pack_sequences (fixed-length training sequences) --------------------

def test_pack_sequences_tiles_token_line(spark):
    """Fragments per sequence sum to exactly seq_len (except the tail),
    every doc's fragments tile [0, weight), and straddling docs split."""
    import numpy as np

    from marc_solr_profiling_spark.operators.sampling import pack_sequences

    rng = np.random.default_rng(11)
    w = rng.integers(0, 700, 300)
    docs = spark.createDataFrame(
        [(int(i), int(t)) for i, t in enumerate(w)],
        "doc_id long, n_tokens long")
    L = 512
    rows = pack_sequences(docs, L, partitions=8).collect()
    # per-doc tiling
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    total = int(w.sum())
    for d, frs in by_doc.items():
        frs.sort(key=lambda r: r["tok_from"])
        assert frs[0]["tok_from"] == 0
        assert frs[-1]["tok_to"] == w[d]
        for a, b in zip(frs, frs[1:]):
            assert a["tok_to"] == b["tok_from"]
            assert b["seq_id"] == a["seq_id"] + 1
    assert set(by_doc) == {i for i in range(300) if w[i] > 0}
    # per-sequence fullness
    by_seq = {}
    for r in rows:
        by_seq[r["seq_id"]] = by_seq.get(r["seq_id"], 0) + (
            r["tok_to"] - r["tok_from"])
    n_seq = -(-total // L)
    assert set(by_seq) == set(range(n_seq))
    for s, n in by_seq.items():
        assert n == (L if s < n_seq - 1 else total - L * (n_seq - 1))


def test_pack_sequences_partition_invariant(spark):
    from marc_solr_profiling_spark.operators.sampling import pack_sequences

    docs = spark.createDataFrame(
        [(i, 100 + (i * 37) % 400) for i in range(200)],
        "doc_id long, n_tokens long")
    base = sorted(tuple(r) for r in
                  pack_sequences(docs, 256, partitions=1).collect())
    for parts in (3, 8):
        got = sorted(tuple(r) for r in
                     pack_sequences(docs, 256, partitions=parts).collect())
        assert got == base


# --- BPE-denominated budgets (trained tokenizer through packing) ---------

def test_pack_shards_bpe_differential(spark):
    """pack_shards_bpe with a CORPUS-TRAINED tokenizer
    (bpe.py:tokenizer_from_corpus) equals a serial reference: encode
    every doc with the same tokenizer driver-side, prefix-sum, bin."""
    from marc_solr_profiling_spark.functions.bpe import (
        tokenizer_from_corpus,
    )
    from marc_solr_profiling_spark.operators.sampling import (
        pack_shards_bpe,
    )

    rows = [(i, f"the quick brown fox {i} jumps over the lazy dog "
                * (1 + i % 5)) for i in range(120)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    tok = tokenizer_from_corpus(docs, n_merges=12, byte_level=True)
    got = {r.doc_id: (r.bpe_tokens, r.shard_id) for r in
           pack_shards_bpe(docs, 400, tokenizer=tok,
                           partitions=4).collect()}
    # serial reference with the SAME trained tokenizer
    counts = [tok.count(t) for _, t in rows]
    start = np.concatenate([[0], np.cumsum(counts)[:-1]])
    for i in range(120):
        assert got[i] == (counts[i], start[i] // 400), i
    # fallback proxy path still packs (budget in whitespace pieces)
    fb = pack_shards_bpe(docs, 400, tokenizer=None, partitions=4)
    assert fb.count() == 120


def test_temperature_plan_bpe_weights_by_tokens(spark):
    """temperature_plan_bpe shares are TOKEN shares, not doc shares: a
    stratum with few huge docs must out-share one with many tiny docs."""
    from marc_solr_profiling_spark.functions.bpe import tiny_tokenizer
    from marc_solr_profiling_spark.operators.sampling import (
        temperature_plan_bpe,
    )

    rows = ([(i, "big", "alpha beta gamma delta " * 50)
             for i in range(5)]
            + [(100 + i, "small", "x y") for i in range(50)])
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    plan = {r.stratum: r for r in temperature_plan_bpe(
        docs, alpha=0.3, stratum_col="lang",
        tokenizer=tiny_tokenizer()).collect()}
    assert plan["big"].n_docs == 5 and plan["small"].n_docs == 50
    assert plan["big"].share > plan["small"].share  # token-weighted
    # doc-count fallback flips it
    from marc_solr_profiling_spark.operators.sampling import (
        temperature_rebalance_plan,
    )
    dc = {r.stratum: r for r in temperature_rebalance_plan(
        docs, alpha=0.3, stratum_col="lang").collect()}
    assert dc["small"].share > dc["big"].share
