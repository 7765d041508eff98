"""Naive-Bayes hashed-bucket quality classifier (GPT-3-style model-based
filtering stage): hand-computed scores on a tiny corpus, kernel-vs-join
differential, and the hashing contract (Spark conv(md5) == hashlib
top-12-bits == DuckDB substr(md5))."""

from __future__ import annotations

import hashlib
import math

import pytest

from marc_solr_profiling_spark.functions.quality_classifier import (
    N_BUCKETS,
    nb_quality_score,
    nb_score_join,
    train_nb_model,
)


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:3], 16)


POS = [(0, "good clean prose text"), (2, "clean prose again")]
NEG = [(1, "spam spam junk"), (3, "junk junk junk spam")]
ALL = POS + NEG + [(4, "clean prose with junk"), (5, "")]


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(ALL, "doc_id long, text string")
    pos = docs.filter("doc_id in (0, 2)")
    neg = docs.filter("doc_id in (1, 3)")
    return docs, pos, neg


def _expected_scores(alpha=0.5):
    """Straight-line numpy-free re-derivation of the NB log-ratio."""
    cpos: dict = {}
    cneg: dict = {}
    for _, t in POS:
        for w in t.split():
            cpos[_bucket(w)] = cpos.get(_bucket(w), 0) + 1
    for _, t in NEG:
        for w in t.split():
            cneg[_bucket(w)] = cneg.get(_bucket(w), 0) + 1
    n_pos = sum(cpos.values())
    n_neg = sum(cneg.values())

    def s(tok):
        b = _bucket(tok)
        return math.log((cpos.get(b, 0) + alpha) / (n_pos + alpha * N_BUCKETS)) \
            - math.log((cneg.get(b, 0) + alpha) / (n_neg + alpha * N_BUCKETS))

    out = {}
    for doc_id, t in ALL:
        toks = t.split()
        if not toks:
            continue
        out[doc_id] = round(sum(s(w) for w in toks), 4)
    return out


def test_hand_computed_scores(spark, frames):
    docs, pos, neg = frames
    got = {
        r["doc_id"]: (r["n_tokens"], r["nb_logratio"], r["keep"])
        for r in nb_quality_score(docs, pos, neg, alpha=0.5).collect()
    }
    want = _expected_scores()
    assert set(got) == set(want)  # empty doc 5 absent
    for doc_id, exp in want.items():
        n_tok, score, keep = got[doc_id]
        assert n_tok == len(dict(ALL)[doc_id].split())
        assert score == pytest.approx(exp, abs=1e-9)
        assert keep == (score > 0.0)
    # seed docs classify to their own side; the mixed doc is between
    assert got[0][2] and got[2][2]
    assert not got[1][2] and not got[3][2]


def test_kernel_matches_join_path(spark, frames):
    docs, pos, neg = frames
    a = {tuple(r) for r in nb_quality_score(docs, pos, neg).collect()}
    b = {tuple(r) for r in nb_score_join(docs, pos, neg).collect()}
    assert a == b


def test_train_counts_and_bucket_contract(spark, frames):
    _, pos, neg = frames
    cpos, n_pos, cneg, n_neg = train_nb_model(pos, neg)
    assert n_pos == 7.0 and n_neg == 7.0
    # JVM conv(substr(md5)) bucketing must equal the hashlib top-12-bit
    # bucketing the kernel uses
    for w in ("good", "clean", "prose", "spam", "junk", "text", "again"):
        b = _bucket(w)
        code = int.from_bytes(
            hashlib.md5(w.encode()).digest()[:8], "big", signed=True)
        assert (code & 0xFFFFFFFFFFFFFFFF) >> 52 == b
    assert cpos[_bucket("clean")] >= 2.0
    assert cneg[_bucket("junk")] >= 4.0


def test_duckdb_twin_on_documents(spark):
    """The ORACLE_SQL twin and the Spark path agree on the real
    testdata table (the same comparison the driver gate runs)."""
    import duckdb

    from marc_solr_profiling_spark.queries import ORACLE_SQL, QUERIES

    sf = "/root/testdata/sf0.001"
    sdf = QUERIES["quality_classifier"](spark, sf).collect()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    odf = con.execute(ORACLE_SQL["quality_classifier"]).fetchall()
    got = {r["doc_id"]: (r["n_tokens"], r["nb_logratio"], r["keep"])
           for r in sdf}
    want = {r[0]: (r[1], r[2], r[3]) for r in odf}
    assert set(got) == set(want)
    n_keep = sum(1 for v in want.values() if v[2])
    assert 0 < n_keep < len(want)  # non-vacuous: both classes present
    for k, (n, s, kp) in want.items():
        gn, gs, gk = got[k]
        assert gn == n and gk == kp
        assert gs == pytest.approx(s, abs=2e-4)
