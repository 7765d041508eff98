"""Model-based quality classification — the GPT-3 / PaLM / FineWeb
"quality classifier" pipeline stage.

GPT-3 (Brown et al. 2020, Appendix A) filters CommonCrawl with a linear
classifier trained to separate curated reference corpora (WebText,
Wikipedia, Books) from raw crawl pages; PaLM and FineWeb-Edu run the
same stage with fasttext-style models. This module is that stage with a
deterministic, engine-portable stand-in for fasttext: a multinomial
Naive Bayes model over HASHED token buckets —

    score(doc) = sum over tokens t of
        ln( (c_pos[b(t)] + a) / (N_pos + a*D) )
      - ln( (c_neg[b(t)] + a) / (N_neg + a*D) )

with ``b(t)`` the hashing-trick bucket (first 3 hex chars of
``md5(t)``, so D = 4096 and the bucket function is bit-identical in
Spark, hashlib, and DuckDB), ``c_pos/c_neg`` per-bucket token counts on
the positive/negative seed corpora, and add-alpha smoothing so unseen
buckets stay finite. A positive score means the document looks more
like the curated corpus than the crawl sample — the keep rule. NB +
hashed buckets keeps every quantity exactly re-derivable in SQL (the
oracle twin), which an SGD-trained fasttext is not; the pipeline shape
— train on small labeled seeds, score the whole corpus with a
broadcast model — is identical.

Scale shape: the model is bounded by D = 4096 buckets regardless of
corpus size; training is one explode + one 4096-key groupBy over the
(small by definition) seed corpora; scoring is ZERO shuffle — the dense
log-ratio array is broadcast and each document is scored in one Arrow
kernel pass (md5 token codes memoized per distinct token per worker,
the ``lm.token_codes_md5`` scheme shared with the LM / decontamination
/ fused-pass kernels, so token identity is bit-identical across the
whole webtext family).

Reference provenance: new-scope LLM-pipeline operator (no reference
analog); the train-on-trusted / score-everything shape mirrors
functions/lm.py (CCNet stage).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .lm import token_codes_md5
from .textstats import tokens_simple

# 16^3 buckets: one bucket per 3-hex-char md5 prefix. Small enough to
# broadcast as a dense array, large enough that seed-corpus token
# distributions stay separable under the hashing trick.
N_BUCKETS = 4096


def token_bucket_expr(tok: Column) -> Column:
    """Hashing-trick bucket of a token, JVM-side: first 3 hex chars of
    md5 parsed base-16 (0..4095). DuckDB twin: the same substr(md5(t),
    1,3) string, or its base-16 value."""
    return F.conv(F.substring(F.md5(tok), 1, 3), 16, 10).cast("int")


def train_nb_model(pos_docs: DataFrame, neg_docs: DataFrame,
                   text_col: str = "text"):
    """Count seed-corpus tokens per hashed bucket. Returns
    ``(pos_counts, n_pos, neg_counts, n_neg)`` with the counts as dense
    float64[N_BUCKETS] numpy arrays — driver-sized by construction
    (<= 4096 rows collected per class, whatever the seed size)."""
    import numpy as np

    def bucket_counts(df: DataFrame):
        rows = (
            df.select(F.explode(tokens_simple(text_col)).alias("w"))
            .select(token_bucket_expr(F.col("w")).alias("b"))
            .groupBy("b").agg(F.count("*").alias("c"))
            .collect()
        )
        arr = np.zeros(N_BUCKETS, dtype=np.float64)
        for r in rows:
            arr[r["b"]] = float(r["c"])
        return arr

    pos = bucket_counts(pos_docs)
    neg = bucket_counts(neg_docs)
    return pos, float(pos.sum()), neg, float(neg.sum())


def _logratio_array(pos, n_pos: float, neg, n_neg: float, alpha: float):
    import numpy as np

    d = float(N_BUCKETS)
    return (
        np.log((pos + alpha) / (n_pos + alpha * d))
        - np.log((neg + alpha) / (n_neg + alpha * d))
    )


def nb_quality_score(docs: DataFrame, pos_docs: DataFrame,
                     neg_docs: DataFrame, alpha: float = 0.5,
                     key_col: str = "doc_id", text_col: str = "text",
                     keep_threshold: float = 0.0,
                     round_to: int = 4) -> DataFrame:
    """The composed classifier stage: train on the seeds, score every
    document — ``(key, n_tokens, nb_logratio, keep)``, one row per
    document with >= 1 token (the webtext family's shared drop rule).

    Production path: the dense log-ratio array (4096 float64) is
    broadcast into one Arrow kernel; tokens arrive already tokenized by
    the shared JVM ``tokens_simple`` expression, are md5-coded once per
    distinct token per worker, bucketed by the code's top 12 bits
    (== the md5 hex prefix), gathered against the array, and summed per
    document with ``np.add.reduceat`` — zero shuffle, zero join.
    """
    import numpy as np
    import pandas as pd

    pos, n_pos, neg, n_neg = train_nb_model(pos_docs, neg_docs, text_col)
    lr = _logratio_array(pos, n_pos, neg, n_neg, alpha)

    spark = docs.sparkSession
    bc_lr = spark.sparkContext.broadcast(lr)
    key_t = docs.select(key_col).schema.fields[0].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_t}, n_tokens long, nb_logratio double, "
        f"keep boolean"
    )
    tok = docs.select(
        F.col(key_col), tokens_simple(text_col).alias("tk")
    ).filter(F.size("tk") >= 1)

    def score(batches):
        memo = {}
        table = bc_lr.value
        shift = np.uint64(52)
        for pdf in batches:
            keys = pdf[key_col].to_numpy()
            lens = pdf["tk"].map(len).to_numpy(dtype=np.int64)
            flat = [t for tk in pdf["tk"] for t in tk]
            if len(flat) == 0:
                continue
            codes = token_codes_md5(flat, memo)
            buckets = (codes.view(np.uint64) >> shift).astype(np.int64)
            per_tok = table[buckets]
            starts = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            sums = np.add.reduceat(per_tok, starts)
            score = np.round(sums, round_to)
            yield pd.DataFrame({
                key_col: keys,
                "n_tokens": lens,
                "nb_logratio": score,
                "keep": score > keep_threshold,
            })

    return tok.mapInPandas(score, schema=out_schema)


def nb_score_join(docs: DataFrame, pos_docs: DataFrame,
                  neg_docs: DataFrame, alpha: float = 0.5,
                  key_col: str = "doc_id", text_col: str = "text",
                  keep_threshold: float = 0.0,
                  round_to: int = 4) -> DataFrame:
    """DataFrame-path twin of :func:`nb_quality_score` (explode + one
    broadcast join against the <= 4096-row model frame) — for callers
    that materialize or persist models, and the differential test
    anchor for the kernel path."""
    import numpy as np

    pos, n_pos, neg, n_neg = train_nb_model(pos_docs, neg_docs, text_col)
    lr = _logratio_array(pos, n_pos, neg, n_neg, alpha)
    spark = docs.sparkSession
    model = spark.createDataFrame(
        [(int(b), float(lr[b])) for b in range(N_BUCKETS)],
        "b int, logratio double",
    )
    inst = docs.select(
        F.col(key_col), F.explode(tokens_simple(text_col)).alias("w")
    ).select(key_col, token_bucket_expr(F.col("w")).alias("b"))
    scored = inst.join(F.broadcast(model), "b").groupBy(key_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.round(F.sum("logratio"), round_to).alias("nb_logratio"),
    )
    return scored.select(
        key_col, "n_tokens", "nb_logratio",
        (F.col("nb_logratio") > F.lit(keep_threshold)).alias("keep"),
    )
