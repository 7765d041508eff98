"""Pure-function tier for the multi-term block-max WAND scorer
(operators/wand.py:_score_blocks_bmw): rank-identity vs a brute-force
numpy BM25 over randomized corpora, exact-pruning invariants, min_match
(AND / mm) semantics, and the blocks-skipped metric.

Mirrors the reference's relevance-ranking contract (solrconfig.xml:64-83:
sort=score desc + internal-docid tie-break; q.op=AND / mm at :68,76).
"""

import math

import numpy as np
import pandas as pd
import pytest

from marc_solr_profiling_spark.operators.varbyte import (
    delta_encode, varbyte_encode,
)
from marc_solr_profiling_spark.operators.wand import (
    K1, B, _range_max, _score_blocks_bmw, _sparse_table, _topk_exact,
)

AVGDL = 40.0


def _make_corpus(rng, n_docs=300, n_terms=6, df_fracs=None):
    """(tf matrix, doc_lens): tf[d, t] with a hot 'stopword' column."""
    tf = np.zeros((n_docs, n_terms), dtype=np.int64)
    for t in range(n_terms):
        # term 0 = stopword (df ~90%), later terms increasingly rare
        if df_fracs is not None:
            frac = df_fracs[t]
        else:
            frac = 0.9 if t == 0 else 0.4 / t
        docs = rng.choice(n_docs, size=max(int(n_docs * frac), 2),
                          replace=False)
        tf[docs, t] = rng.integers(1, 6, size=docs.size)
    dl = rng.integers(10, 80, size=n_docs).astype(np.float64)
    return tf, dl


def _blocks_df(tf, dl, idf, n_salts=2, block_size=8):
    """Build the segment-block DataFrame exactly like segments.py does:
    per (term, salt), doc-sorted, blocked, varbyte-encoded."""
    rows = []
    n_docs, n_terms = tf.shape
    salts = np.arange(n_docs) % n_salts
    for t in range(n_terms):
        for s in range(n_salts):
            docs = np.flatnonzero((tf[:, t] > 0) & (salts == s))
            for b0 in range(0, docs.size, block_size):
                blk = docs[b0:b0 + block_size]
                tfs = tf[blk, t].astype(np.float64)
                dls = dl[blk]
                wnorm = tfs * (K1 + 1) / (
                    tfs + K1 * (1 - B + B * dls / AVGDL)
                )
                rows.append({
                    "term": f"t{t}", "salt": s,
                    "first_doc": int(blk[0]), "last_doc": int(blk[-1]),
                    "doc_gaps": delta_encode(blk.astype(np.uint64)),
                    "tfs": varbyte_encode(tfs.astype(np.uint64)),
                    "dls": varbyte_encode(dls.astype(np.uint64)),
                    "max_wnorm": float(wnorm.max()),
                })
    return pd.DataFrame(rows)


def _brute_topk(tf, dl, idf, k, min_match=1):
    w = np.zeros(tf.shape, dtype=np.float64)
    for t in range(tf.shape[1]):
        tt = tf[:, t].astype(np.float64)
        w[:, t] = idf[t] * tt * (K1 + 1) / (
            tt + K1 * (1 - B + B * dl / AVGDL)
        )
        w[tf[:, t] == 0, t] = 0.0
    totals = w.sum(axis=1)
    counts = (tf > 0).sum(axis=1)
    ok = np.flatnonzero((counts >= min_match) & (totals > 0))
    sel = _topk_exact(ok, totals[ok], k)
    return ok[sel], totals[ok][sel]


def _bmw_topk(blocks, idf_by_term, k, min_match=1):
    theta = -math.inf
    ids_p, sc_p, nskip = [], [], 0
    for _, sub in blocks.groupby("salt", sort=False):
        ids, scores, nsk, theta = _score_blocks_bmw(
            sub.reset_index(drop=True), idf_by_term, k, AVGDL,
            min_match=min_match, theta0=theta,
        )
        ids_p.append(ids)
        sc_p.append(scores)
        nskip += nsk
    all_ids = np.concatenate(ids_p)
    all_sc = np.concatenate(sc_p)
    sel = _topk_exact(all_ids, all_sc, k)
    return all_ids[sel], all_sc[sel], nskip


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("min_match", [1, 2, 3])
def test_bmw_rank_identical_to_brute_force(seed, min_match):
    rng = np.random.default_rng(seed)
    tf, dl = _make_corpus(rng)
    n_docs, n_terms = tf.shape
    df = (tf > 0).sum(axis=0)
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    idf_by_term = {f"t{t}": float(idf[t]) for t in range(n_terms)}
    blocks = _blocks_df(tf, dl, idf)

    want_ids, want_sc = _brute_topk(tf, dl, idf, 10, min_match)
    got_ids, got_sc, _ = _bmw_topk(blocks, idf_by_term, 10, min_match)
    assert got_ids.tolist() == want_ids.tolist()
    np.testing.assert_allclose(got_sc, want_sc, rtol=1e-12)


def test_bmw_skips_blocks_on_multiterm_query():
    """The round-1 gap: a multi-term query must PRUNE, not score every
    matched block — a stopword term's low-cap blocks that overlap no
    high-cap region never get decoded."""
    rng = np.random.default_rng(7)
    # web-real shape: one stopword + rare high-idf terms; the top-k is
    # driven by the rare terms, so stopword blocks overlapping no
    # rare-term region fall under theta
    tf, dl = _make_corpus(rng, n_docs=2000, n_terms=4,
                          df_fracs=[0.9, 0.05, 0.02, 0.01])
    n_docs, n_terms = tf.shape
    df = (tf > 0).sum(axis=0)
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    idf_by_term = {f"t{t}": float(idf[t]) for t in range(n_terms)}
    blocks = _blocks_df(tf, dl, idf, n_salts=2, block_size=8)

    want_ids, _ = _brute_topk(tf, dl, idf, 10)
    got_ids, _, nskip = _bmw_topk(blocks, idf_by_term, 10)
    assert got_ids.tolist() == want_ids.tolist()
    assert nskip > 0, "multi-term query decoded every block (no pruning)"
    # pruning should be substantial on this shape, not incidental
    assert nskip > len(blocks) * 0.2


def test_and_semantics_empty_when_no_doc_matches_all():
    # 2 docs, 2 terms, disjoint: AND(min_match=2) must return nothing
    tf = np.array([[3, 0], [0, 2]])
    dl = np.array([20.0, 30.0])
    idf = np.array([1.0, 1.0])
    blocks = _blocks_df(tf, dl, idf, n_salts=1, block_size=8)
    got_ids, got_sc, _ = _bmw_topk(blocks, {"t0": 1.0, "t1": 1.0}, 5,
                                   min_match=2)
    assert got_ids.size == 0


def test_sparse_table_range_max():
    rng = np.random.default_rng(3)
    vals = rng.standard_normal(37)
    st = _sparse_table(vals)
    los, his = [], []
    for lo in range(vals.size):
        for hi in range(lo + 1, vals.size + 1):
            los.append(lo)
            his.append(hi)
    got = _range_max(st, np.array(los), np.array(his))
    want = np.array([vals[lo:hi].max() for lo, hi in zip(los, his)])
    np.testing.assert_array_equal(got, want)


def test_salt_partitions_conf_override(spark):
    """Cluster-size comparisons hold the scoring layout constant via
    spark.marc.saltPartitions (tools/scaling_bench.py protocol v4)."""
    from marc_solr_profiling_spark.operators.wand import _salt_partitions

    class _Idx:
        pass

    idx = _Idx()
    idx.spark = spark
    idx.n_salts = 64
    auto = _salt_partitions(idx)
    assert 1 <= auto <= 64
    spark.conf.set("spark.marc.saltPartitions", "7")
    try:
        assert _salt_partitions(idx) == 7
    finally:
        spark.conf.unset("spark.marc.saltPartitions")
    assert _salt_partitions(idx) == auto


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bmw_exclusion_rank_identical(seed):
    """MUST_NOT through the kernel (exclude_ids): excluded docs never
    qualify, never raise theta, never reach the heap — rank-identity vs
    brute force with the excluded docs dropped AFTER scoring (stats stay
    collection-wide). Excluding the df~90% stopword's doc set is the
    harsh case: most of the corpus is masked."""
    rng = np.random.default_rng(seed)
    tf, dl = _make_corpus(rng)
    n_docs, n_terms = tf.shape
    df = (tf > 0).sum(axis=0)
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    # score terms t1..t5; exclude every doc containing t0
    score_terms = list(range(1, n_terms))
    idf_by_term = {f"t{t}": float(idf[t]) for t in score_terms}
    blocks = _blocks_df(tf, dl, idf)
    sc_blocks = blocks[blocks["term"] != "t0"]
    excluded = np.flatnonzero(tf[:, 0] > 0).astype(np.int64)

    # brute force: score t1..t5 only, drop excluded docs post-hoc
    tf2 = tf[:, 1:]
    w = np.zeros(tf2.shape, dtype=np.float64)
    for j, t in enumerate(score_terms):
        tt = tf[:, t].astype(np.float64)
        w[:, j] = idf[t] * tt * (K1 + 1) / (
            tt + K1 * (1 - B + B * dl / AVGDL))
        w[tf[:, t] == 0, j] = 0.0
    totals = w.sum(axis=1)
    keep = np.ones(n_docs, dtype=bool)
    keep[excluded] = False
    ok = np.flatnonzero((totals > 0) & keep)
    sel = _topk_exact(ok, totals[ok], 10)
    want_ids, want_sc = ok[sel], totals[ok][sel]

    theta = -math.inf
    ids_p, sc_p = [], []
    for s, sub in sc_blocks.groupby("salt", sort=False):
        salt_excl = excluded[excluded % 2 == s]  # n_salts=2, salt = doc%2
        ids, scores, _, theta = _score_blocks_bmw(
            sub.reset_index(drop=True), idf_by_term, 10, AVGDL,
            theta0=theta, exclude_ids=salt_excl,
        )
        ids_p.append(ids)
        sc_p.append(scores)
    all_ids = np.concatenate(ids_p)
    all_sc = np.concatenate(sc_p)
    gsel = _topk_exact(all_ids, all_sc, 10)
    assert all_ids[gsel].tolist() == want_ids.tolist()
    np.testing.assert_allclose(all_sc[gsel], want_sc, rtol=1e-12)
