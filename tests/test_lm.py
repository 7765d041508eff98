"""Bigram-LM perplexity (the CCNet quality stage) against a hand-computed
reference: exact probabilities on a tiny corpus, head-vs-tail ordering on
a realistic one."""
from __future__ import annotations

import math

import pytest

from marc_solr_profiling_spark.functions.lm import (
    bigram_perplexity,
    ccnet_perplexity,
    train_bigram_lm,
)


def test_bigram_lm_exact_small(spark):
    ref = spark.createDataFrame(
        [(0, "a b a b c")], "doc_id long, text string")
    bc, hc, v = train_bigram_lm(ref)
    assert v == 3
    got_bc = {r.bg: r.c2 for r in bc.collect()}
    assert got_bc == {"a b": 2, "b a": 1, "b c": 1}
    got_hc = {r.w1: r.c1 for r in hc.collect()}
    assert got_hc == {"a": 2, "b": 2}

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "c c"), (3, "single")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           bigram_perplexity(docs, bc, hc, v, alpha=0.1).collect()}
    a, V = 0.1, 3
    # doc 1: p(b|a)=(2+a)/(2+aV), p(c|b)=(1+a)/(2+aV)
    lp1 = math.log((2 + a) / (2 + a * V)) + math.log((1 + a) / (2 + a * V))
    assert out[1].n_bigrams == 2
    assert out[1].ppl == pytest.approx(round(math.exp(-lp1 / 2), 4))
    # doc 2: unseen history 'c' -> uniform a/(aV) = 1/V
    assert out[2].ppl == pytest.approx(round(float(V), 4))
    # doc 3: no bigrams -> absent
    assert 3 not in out


def test_ccnet_head_vs_tail_ordering(spark):
    """In-domain text scores lower perplexity than shuffled-vocab noise —
    the property CCNet's bucketing relies on."""
    ref_rows = [(i, "the cat sat on the mat and the dog ran off") for
                i in range(10)]
    ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
    docs = spark.createDataFrame(
        [(100, "the cat sat on the mat"),
         (101, "mat dog the off cat zq")],
        "doc_id long, text string")
    out = {r.doc_id: r.ppl for r in ccnet_perplexity(docs, ref).collect()}
    assert out[100] < out[101]


def test_ccnet_empty_reference_raises(spark):
    import pytest as _pt

    docs = spark.createDataFrame([(1, "some words here")],
                                 "doc_id long, text string")
    empty_ref = spark.createDataFrame([], "doc_id long, text string")
    with _pt.raises(ValueError, match="reference corpus"):
        ccnet_perplexity(docs, empty_ref)
