"""DSIR importance resampling (functions/dsir.py) — hand-computed
log-weights, deterministic Gumbel keys, and selection semantics.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from marc_solr_profiling_spark.functions.dsir import (
    N_BUCKETS, dsir_features_expr, dsir_logweight, dsir_resample,
    gumbel_key_expr)


def _bucket(g: str) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:3], 16)


def _feats(text: str) -> list:
    import re
    tk = re.findall(r"[a-z0-9]+", text.lower())
    return tk + [f"{a} {b}" for a, b in zip(tk, tk[1:])]


def _expected_logw(text: str, tgt_texts, raw_texts, alpha=0.5):
    from collections import Counter
    ct, cr = Counter(), Counter()
    for t in tgt_texts:
        ct.update(_bucket(g) for g in _feats(t))
    for t in raw_texts:
        cr.update(_bucket(g) for g in _feats(t))
    nt, nr = sum(ct.values()), sum(cr.values())
    d = float(N_BUCKETS)
    s = 0.0
    for g in _feats(text):
        b = _bucket(g)
        s += math.log((ct[b] + alpha) / (nt + alpha * d))
        s -= math.log((cr[b] + alpha) / (nr + alpha * d))
    return s


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps"),
        (2, "quick brown foxes everywhere"),
        (3, "stock market report quarterly earnings"),
        (4, "earnings report for the market"),
        (5, "the fox likes the market"),
        (6, "completely unrelated gibberish tokens here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_features_expr_counts(spark):
    df = spark.createDataFrame([("a b c",), ("solo",), ("",)], "text string")
    out = df.select(dsir_features_expr("text").alias("f")).collect()
    assert out[0]["f"] == ["a", "b", "c", "a b", "b c"]
    assert out[1]["f"] == ["solo"]
    assert out[2]["f"] == []


def test_logweight_matches_hand_computation(corpus):
    texts = {r["doc_id"]: r["text"] for r in corpus.collect()}
    tgt = corpus.filter(F.col("doc_id") <= 2)
    out = {r["doc_id"]: (r["n_feats"], r["dsir_logw"])
           for r in dsir_logweight(corpus, tgt).collect()}
    tgt_texts = [texts[1], texts[2]]
    raw_texts = list(texts.values())
    for k, text in texts.items():
        exp = _expected_logw(text, tgt_texts, raw_texts)
        n_exp = len(_feats(text))
        assert out[k][0] == n_exp
        assert out[k][1] == pytest.approx(round(exp, 4), abs=2e-4)
    # target-like docs must outscore the off-topic one per feature
    assert out[1][1] / out[1][0] > out[3][1] / out[3][0]


def test_gumbel_key_deterministic_and_sql_derivable(corpus):
    got = corpus.select(
        "doc_id", gumbel_key_expr("doc_id", "s1").alias("g")).collect()
    for r in got:
        h = int(hashlib.md5(f"s1:{r['doc_id']}".encode())
                .hexdigest()[:13], 16)
        u = (h + 0.5) / float(1 << 52)
        assert r["g"] == pytest.approx(-math.log(-math.log(u)), rel=1e-12)
    again = corpus.select(
        "doc_id", gumbel_key_expr("doc_id", "s1").alias("g")).collect()
    assert [r["g"] for r in got] == [r["g"] for r in again]
    other = corpus.select(
        "doc_id", gumbel_key_expr("doc_id", "s2").alias("g")).collect()
    assert [r["g"] for r in got] != [r["g"] for r in other]


def test_resample_is_gumbel_topk(corpus):
    tgt = corpus.filter(F.col("doc_id") <= 2)
    full = dsir_logweight(corpus, tgt).withColumn(
        "gumbel_key",
        F.round(F.col("dsir_logw") + gumbel_key_expr("doc_id", "dsir"), 4))
    ordered = [r["doc_id"] for r in
               full.orderBy(F.desc("gumbel_key"), F.asc("doc_id")).collect()]
    picked = dsir_resample(corpus, tgt, n_select=3)
    rows = picked.collect()
    assert [r["doc_id"] for r in rows] == ordered[:3]
    assert len(rows) == 3
    assert set(rows[0].asDict()) == {
        "doc_id", "n_feats", "dsir_logw", "gumbel_key"}


def test_resample_duckdb_twin(corpus):
    """The full chain replayed in DuckDB on the same rows — the oracle
    contract, asserted in-test on a corpus with known shape."""
    import duckdb

    pdf = corpus.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    sql = """
WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+')
            AS toks FROM documents),
feats AS (
  SELECT doc_id, unnest(list_concat(toks,
    CASE WHEN len(toks) >= 2 THEN
      list_transform(range(0, len(toks) - 1),
                     i -> toks[i+1] || ' ' || toks[i+2])
    ELSE [] END)) AS g
  FROM tk WHERE len(toks) >= 1),
bkt AS (SELECT doc_id, substr(md5(g), 1, 3) AS b FROM feats),
ct AS (SELECT b, count(*)::DOUBLE AS c FROM bkt WHERE doc_id <= 2 GROUP BY b),
cr AS (SELECT b, count(*)::DOUBLE AS c FROM bkt GROUP BY b),
nt AS (SELECT coalesce(sum(c), 0)::DOUBLE AS n FROM ct),
nr AS (SELECT coalesce(sum(c), 0)::DOUBLE AS n FROM cr),
scored AS (
  SELECT k.doc_id,
         ln((coalesce(t.c, 0) + 0.5) / ((SELECT n FROM nt) + 0.5 * 4096))
       - ln((coalesce(r.c, 0) + 0.5) / ((SELECT n FROM nr) + 0.5 * 4096))
         AS s
  FROM bkt k LEFT JOIN ct t ON k.b = t.b LEFT JOIN cr r ON k.b = r.b),
lw AS (SELECT doc_id, count(*)::BIGINT AS n_feats,
              round(sum(s), 4) AS dsir_logw
       FROM scored GROUP BY doc_id)
SELECT doc_id, n_feats, dsir_logw,
       round(dsir_logw - ln(-ln(
         ((('0x' || substr(md5('dsir:' || CAST(doc_id AS VARCHAR)), 1, 13))
           ::UBIGINT)::DOUBLE + 0.5) / 4503599627370496.0)), 4)
       AS gumbel_key
FROM lw
ORDER BY gumbel_key DESC, doc_id ASC
LIMIT 3
"""
    duck = con.sql(sql).fetchall()
    tgt = corpus.filter(F.col("doc_id") <= 2)
    got = [tuple(r) for r in dsir_resample(corpus, tgt, 3).collect()]
    assert got == [tuple(r) for r in duck]


def test_fast64_variant_semantics_and_determinism(corpus, spark):
    """dsir_logweight_fast: same pipeline, numeric bigram identity —
    target-like docs outscore off-topic ones per feature, output is
    deterministic, n_feats matches the md5 path exactly (feature
    COUNTS are hash-family independent)."""
    from pyspark.sql import functions as F

    from marc_solr_profiling_spark.functions.dsir import (
        dsir_logweight_fast)

    tgt = corpus.filter(F.col("doc_id") <= 2)
    out = {r["doc_id"]: (r["n_feats"], r["dsir_logw"])
           for r in dsir_logweight_fast(corpus, tgt).collect()}
    texts = {r["doc_id"]: r["text"] for r in corpus.collect()}
    for k, text in texts.items():
        assert out[k][0] == len(_feats(text))
    # same semantic ordering contract as the md5 test
    assert out[1][1] / out[1][0] > out[3][1] / out[3][0]
    again = {r["doc_id"]: (r["n_feats"], r["dsir_logw"])
             for r in dsir_logweight_fast(
                 corpus.repartition(5), tgt).collect()}
    assert again == out


def test_fast64_hand_computed(spark):
    """One three-token doc, hand-replayed bucket arithmetic."""
    import numpy as np

    from marc_solr_profiling_spark.functions.dsir import (
        N_BUCKETS, _fast_feature_buckets, dsir_logweight_fast)

    docs = spark.createDataFrame(
        [(1, "aa bb cc"), (2, "dd ee")], "doc_id long, text string")
    tgt = docs.filter("doc_id = 1")
    got = {r["doc_id"]: r["dsir_logw"]
           for r in dsir_logweight_fast(docs, tgt, alpha=0.5).collect()}
    memo = {}
    b1 = _fast_feature_buckets(["aa", "bb", "cc"], memo)
    b2 = _fast_feature_buckets(["dd", "ee"], memo)
    ct = np.bincount(b1, minlength=N_BUCKETS).astype(float)
    cr = ct + np.bincount(b2, minlength=N_BUCKETS).astype(float)
    d = float(N_BUCKETS)
    lr = (np.log((ct + 0.5) / (ct.sum() + 0.5 * d))
          - np.log((cr + 0.5) / (cr.sum() + 0.5 * d)))
    assert got[1] == pytest.approx(round(float(lr[b1].sum()), 4), abs=1e-9)
    assert got[2] == pytest.approx(round(float(lr[b2].sum()), 4), abs=1e-9)
