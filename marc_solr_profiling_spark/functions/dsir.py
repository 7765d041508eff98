"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023), the hashed-n-gram data-selection stage used to pick
pretraining data that "looks like" a target corpus.

The published pipeline: fit bag-of-hashed-n-gram unigram models on a
TARGET corpus (the distribution you want) and on the RAW pool, weight
every raw document by the log importance ratio

    log w(x) = sum over n-gram features g of x:
        ln p_target[b(g)] - ln p_raw[b(g)]

and sample k documents WITHOUT replacement with probability
proportional to w(x) — implemented here (and in the paper) with the
Gumbel top-k trick: key(x) = log w(x) + Gumbel(0), take the k largest
keys. Features are unigrams AND word bigrams hashed into buckets
(paper: 10k; here the family-standard 4096 ``substr(md5(g),1,3)``
buckets shared with the NB quality classifier, so every quantity stays
bit-identical across Spark, hashlib, and DuckDB).

Everything is deterministic: the Gumbel noise derives from
``md5(seed:key)`` (the hash-split salt pattern), so selection is
re-run-stable and exactly re-derivable in SQL — the oracle twin replays
bucket counts, smoothing, per-doc sums, the Gumbel transform, and the
top-k.

Scale shape (the nb_quality_score template): both models are bounded at
4096 buckets regardless of corpus size — training is one explode + one
4096-key groupBy per corpus (the target is small by definition; the raw
model can be fit on a hash-sample). Scoring the full pool is ZERO
shuffle: the dense log-ratio array broadcasts into one Arrow kernel
that md5-codes unigrams + bigram strings (memoized per distinct gram
per worker), gathers, and ``reduceat``-sums per document. Selection is
TakeOrderedAndProject on the Gumbel key — per-partition heaps, k rows
to the driver, never a global sort.

Reference provenance: new-scope LLM-pipeline operator (no analog in the
reference repo); sits beside functions/quality_classifier.py (GPT-3
quality filtering) as the other published model-based selection stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .quality_classifier import N_BUCKETS, token_bucket_expr
from .textstats import tokens_simple

# 2^52 — md5's first 13 hex chars as a uniform in [0, 1): exact in a
# float64 mantissa, and parseable identically by Spark's conv() and
# DuckDB's ('0x' || s)::UBIGINT
_U52 = float(1 << 52)


def dsir_features_expr(text_col: str) -> Column:
    """Unigram + word-bigram feature instances (WITH multiplicity —
    DSIR models are count-based, unlike the distinct shingle sets of
    MinHash). Bigrams are a ``zip_with`` over two shifted ``slice``
    views of the materialized token array (the lambda-hoisting pattern
    — see dedup.shingles_expr for why ``transform(sequence, ...)`` is
    quadratic). Pure JVM."""
    toks = tokens_simple(text_col)
    m = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, m), F.slice(toks, 2, m),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.concat(toks, bigrams)


def gumbel_key_expr(key_col: str, seed: str = "dsir") -> Column:
    """Deterministic standard-Gumbel noise per key:
    ``u = (md5_52(seed:key) + 0.5) / 2^52`` (strictly inside (0,1)),
    ``g = -ln(-ln(u))``. Pure codegen expressions; the same arithmetic
    is replayed verbatim in the DuckDB twin."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed + ":"),
                           F.col(key_col).cast("string"))),
            1, 13),
        16, 10,
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(_U52)
    return -F.log(-F.log(u))


def train_dsir_model(target_docs: DataFrame, raw_docs: DataFrame,
                     text_col: str = "text"):
    """Hashed-feature counts for the two corpora. Returns
    ``(tgt_counts, n_tgt, raw_counts, n_raw)`` as dense
    float64[N_BUCKETS] arrays — driver-sized by construction."""
    import numpy as np

    def bucket_counts(df: DataFrame):
        rows = (
            df.select(F.explode(dsir_features_expr(text_col)).alias("g"))
            .select(token_bucket_expr(F.col("g")).alias("b"))
            .groupBy("b").agg(F.count("*").alias("c"))
            .collect()
        )
        arr = np.zeros(N_BUCKETS, dtype=np.float64)
        for r in rows:
            arr[r["b"]] = float(r["c"])
        return arr

    tgt = bucket_counts(target_docs)
    raw = bucket_counts(raw_docs)
    return tgt, float(tgt.sum()), raw, float(raw.sum())


def dsir_logweight(docs: DataFrame, target_docs: DataFrame,
                   raw_docs: DataFrame | None = None,
                   alpha: float = 0.5,
                   key_col: str = "doc_id", text_col: str = "text",
                   round_to: int = 4) -> DataFrame:
    """Per-document log importance weight — ``(key, n_feats,
    dsir_logw)``, one row per doc with >= 1 token. ``raw_docs``
    defaults to ``docs`` itself (the paper fits the raw model on a
    sample of the pool being selected from).

    Zero-shuffle Arrow kernel: tokens arrive from the shared JVM
    tokenizer; the kernel forms bigram strings, md5-codes every gram
    once per distinct gram per worker (``lm.token_codes_md5``), buckets
    by the code's top 12 bits, gathers the broadcast log-ratio array,
    and sums per document with ``np.add.reduceat``.
    """
    import numpy as np
    import pandas as pd

    from .lm import token_codes_md5

    tgt, n_tgt, raw, n_raw = train_dsir_model(
        target_docs, raw_docs if raw_docs is not None else docs, text_col)
    d = float(N_BUCKETS)
    lr = (
        np.log((tgt + alpha) / (n_tgt + alpha * d))
        - np.log((raw + alpha) / (n_raw + alpha * d))
    )

    spark = docs.sparkSession
    bc_lr = spark.sparkContext.broadcast(lr)
    key_t = docs.select(key_col).schema.fields[0].dataType.simpleString()
    out_schema = f"{key_col} {key_t}, n_feats long, dsir_logw double"
    tok = docs.select(
        F.col(key_col), tokens_simple(text_col).alias("tk")
    ).filter(F.size("tk") >= 1)

    def score(batches):
        memo: dict = {}
        table = bc_lr.value
        shift = np.uint64(52)
        for pdf in batches:
            keys = pdf[key_col].to_numpy()
            flat: list = []
            lens = np.empty(len(pdf), dtype=np.int64)
            for i, tk in enumerate(pdf["tk"]):
                flat.extend(tk)
                flat.extend(f"{a} {b}" for a, b in zip(tk, tk[1:]))
                lens[i] = 2 * len(tk) - 1
            if not flat:
                continue
            codes = token_codes_md5(flat, memo)
            buckets = (codes.view(np.uint64) >> shift).astype(np.int64)
            per_gram = table[buckets]
            starts = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            sums = np.add.reduceat(per_gram, starts)
            yield pd.DataFrame({
                key_col: keys,
                "n_feats": lens,
                "dsir_logw": np.round(sums, round_to),
            })

    return tok.mapInPandas(score, schema=out_schema)


def dsir_resample(docs: DataFrame, target_docs: DataFrame,
                  n_select: int,
                  raw_docs: DataFrame | None = None,
                  alpha: float = 0.5, seed: str = "dsir",
                  key_col: str = "doc_id", text_col: str = "text",
                  round_to: int = 4) -> DataFrame:
    """The full DSIR selection: Gumbel top-``n_select`` over
    ``dsir_logw + g`` — sampling without replacement with probability
    proportional to the importance weight. Returns the selected rows
    ``(key, n_feats, dsir_logw, gumbel_key)`` ordered by key desc
    (TakeOrderedAndProject; ties break by doc key ascending)."""
    w = dsir_logweight(
        docs, target_docs, raw_docs=raw_docs, alpha=alpha,
        key_col=key_col, text_col=text_col, round_to=round_to)
    keyed = w.withColumn(
        "gumbel_key",
        F.round(F.col("dsir_logw") + gumbel_key_expr(key_col, seed),
                round_to),
    )
    return (
        keyed.orderBy(F.desc("gumbel_key"), F.asc(key_col))
        .limit(n_select)
    )


# --- fast64 variant -------------------------------------------------------
#
# The md5 path above is the ORACLE CONTRACT (bucket = substr(md5(gram),
# 1,3), bit-identical in DuckDB); its 3.2M-doc cost is dominated by
# building every bigram STRING and md5-hashing every distinct bigram
# (measured 554 s vs the NB classifier's 141 s unigram floor). The
# fast64 variant keeps md5 codes for TOKENS (memoized per distinct
# token — the shared token-identity scheme) but derives bigram feature
# identity NUMERICALLY: the same wrapping int64 polynomial over
# adjacent token codes the fast64 MinHash kernel uses
# (dedup._doc_gram_hashes_kernel), splitmix-remixed so the bucket bits
# are uniform. No gram strings exist at all. Same model shape, same
# selection semantics, different (equally valid) hash family — use md5
# only when cross-engine replay matters, exactly the minhash_signatures
# hash_impl contract.

_POLY = 1099511628211  # FNV prime, the shared gram-polynomial base


def _fast_feature_buckets(tk, memo):
    """Bucket array (int64 in [0, N_BUCKETS)) of a doc's unigram +
    bigram features, no strings built for bigrams."""
    import numpy as np

    from .lm import token_codes_md5

    c = token_codes_md5(tk, memo)
    shift = np.uint64(52)
    uni = (c.view(np.uint64) >> shift).astype(np.int64)
    if len(c) < 2:
        return uni
    with np.errstate(over="ignore"):
        poly = c[:-1] * np.int64(_POLY) + c[1:]
    x = poly.view(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    big = (x >> shift).astype(np.int64)
    return np.concatenate([uni, big])


def _fast_bucket_counts(df: DataFrame, text_col: str):
    """Dense float64[N_BUCKETS] feature counts via the kernel bucketing
    — a partial aggregate: each batch emits ONE 4096-long count row,
    summed on the driver (rows collected = batches, driver-sized)."""
    import numpy as np
    import pandas as pd

    tok = df.select(tokens_simple(text_col).alias("tk")).filter(
        F.size("tk") >= 1)

    def counts(batches):
        memo: dict = {}
        for pdf in batches:
            acc = np.zeros(N_BUCKETS, dtype=np.int64)
            for tk in pdf["tk"]:
                b = _fast_feature_buckets(tk, memo)
                acc += np.bincount(b, minlength=N_BUCKETS)
            yield pd.DataFrame({"c": [acc.tolist()]})

    rows = tok.mapInPandas(counts, schema="c array<long>").collect()
    arr = np.zeros(N_BUCKETS, dtype=np.float64)
    for r in rows:
        arr += np.asarray(r["c"], dtype=np.float64)
    return arr


def dsir_logweight_fast(docs: DataFrame, target_docs: DataFrame,
                        raw_docs: DataFrame | None = None,
                        alpha: float = 0.5,
                        key_col: str = "doc_id", text_col: str = "text",
                        round_to: int = 4) -> DataFrame:
    """fast64 twin of :func:`dsir_logweight` — identical pipeline shape
    and output schema, numeric bigram identity (no SQL twin; the md5
    path is the oracle contract)."""
    import numpy as np
    import pandas as pd

    tgt = _fast_bucket_counts(target_docs, text_col)
    raw = _fast_bucket_counts(
        raw_docs if raw_docs is not None else docs, text_col)
    d = float(N_BUCKETS)
    lr = (
        np.log((tgt + alpha) / (tgt.sum() + alpha * d))
        - np.log((raw + alpha) / (raw.sum() + alpha * d))
    )

    spark = docs.sparkSession
    bc_lr = spark.sparkContext.broadcast(lr)
    key_t = docs.select(key_col).schema.fields[0].dataType.simpleString()
    out_schema = f"{key_col} {key_t}, n_feats long, dsir_logw double"
    tok = docs.select(
        F.col(key_col), tokens_simple(text_col).alias("tk")
    ).filter(F.size("tk") >= 1)

    def score(batches):
        memo: dict = {}
        table = bc_lr.value
        for pdf in batches:
            keys = pdf[key_col].to_numpy()
            n = len(pdf)
            lens = np.empty(n, dtype=np.int64)
            sums = np.empty(n, dtype=np.float64)
            for i, tk in enumerate(pdf["tk"]):
                b = _fast_feature_buckets(tk, memo)
                lens[i] = b.size
                sums[i] = table[b].sum()
            yield pd.DataFrame({
                key_col: keys,
                "n_feats": lens,
                "dsir_logw": np.round(sums, round_to),
            })

    return tok.mapInPandas(score, schema=out_schema)
