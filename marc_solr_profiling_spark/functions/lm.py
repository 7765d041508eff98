"""Language-model perplexity scoring — the CCNet quality stage.

CCNet (Wenzek et al. 2020 §3.3) ranks web documents by the perplexity of
a language model trained on a trusted corpus (they use a KenLM 5-gram on
Wikipedia); low-perplexity docs are "head" quality, high-perplexity docs
are tail/garbage. This module is that stage with a deterministic,
engine-portable stand-in for KenLM: an add-alpha-smoothed bigram model —

    p(w2 | w1) = (c(w1 w2) + a) / (c(w1) + a*V)

with ``c(w1)`` defined as the sum of bigram counts with history ``w1``
(so the distribution sums to 1 over the vocabulary) and ``V`` the trained
vocabulary size; per-document perplexity is ``exp(-mean log p)`` over the
document's bigrams. Order 2 + add-alpha keeps every quantity exactly
re-derivable in SQL (the oracle twin), which a backoff KenLM is not; the
pipeline shape — train on a trusted slice, score the whole corpus —
is identical.

Scale shape: the model is two aggregate tables keyed on bigram/history
(bounded by observed bigrams, NOT corpus size). Scoring is one explode of
the corpus bigram stream + two equi-joins against the model + one per-doc
aggregate; when the trusted corpus is Wikipedia-sized the model tables
broadcast, making the whole scorer map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_simple


def bigrams_expr(text_col: str) -> Column:
    """Token bigrams WITH multiplicity (unlike ``shingles_expr``, which
    dedups and has a short-doc fallback — an LM needs the raw stream).
    Docs with < 2 tokens yield an empty array. ``zip_with`` over shifted
    slices, not element_at inside a lambda (see shingles_expr: a lambda's
    child expressions are evaluated per element, which put the tokenizer
    regexp in the per-element loop)."""
    toks = tokens_simple(text_col)
    m = F.greatest(F.size(toks) - 1, F.lit(0))
    grams = F.zip_with(
        F.slice(toks, 1, m), F.slice(toks, 2, m),
        lambda a, b: F.concat_ws(" ", a, b))
    return F.when(F.size(toks) >= 2, grams).otherwise(
        F.array().cast("array<string>"))


def train_bigram_lm(ref_docs: DataFrame, text_col: str = "text"):
    """Train on the trusted corpus. Returns ``(bigram_counts, history_
    counts, vocab_size)`` where bigram_counts = (bg, c2), history_counts =
    (w1, c1 = sum of c2 over that history), vocab_size = |distinct
    tokens|. Two grouped aggregates + one distinct count — each one
    shuffle keyed on a short string."""
    bg = ref_docs.select(
        F.explode(bigrams_expr(text_col)).alias("bg"))
    bigram_counts = bg.groupBy("bg").agg(F.count("*").alias("c2"))
    history_counts = bigram_counts.select(
        F.split(F.col("bg"), " ").getItem(0).alias("w1"), "c2"
    ).groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab_size = (
        ref_docs.select(F.explode(tokens_simple(text_col)).alias("w"))
        .agg(F.countDistinct("w")).first()[0]
    )
    return bigram_counts, history_counts, int(vocab_size)


def bigram_perplexity(docs: DataFrame, bigram_counts: DataFrame,
                      history_counts: DataFrame, vocab_size: int,
                      alpha: float = 0.1, key_col: str = "doc_id",
                      text_col: str = "text",
                      broadcast_model: bool = True,
                      round_to: int = 4) -> DataFrame:
    """Score every document against the trained model: ``(key, n_bigrams,
    ppl)``; docs with < 2 tokens are absent (no bigrams to score). An
    unseen history backs off to the uniform ``1/V`` (the add-alpha limit
    when c1 = c2 = 0)."""
    b = F.broadcast if broadcast_model else (lambda df: df)
    inst = docs.select(
        F.col(key_col), F.explode(bigrams_expr(text_col)).alias("bg")
    ).withColumn("w1", F.split(F.col("bg"), " ").getItem(0))
    joined = (
        inst.join(b(bigram_counts), "bg", "left")
        .join(b(history_counts), "w1", "left")
        .select(
            key_col,
            F.log(
                (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(alpha))
                / (F.coalesce(F.col("c1"), F.lit(0))
                   + F.lit(alpha * vocab_size))
            ).alias("logp"),
        )
    )
    return joined.groupBy(key_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(F.exp(-F.avg("logp")), round_to).alias("ppl"),
    )


def ccnet_perplexity(docs: DataFrame, ref_docs: DataFrame,
                     alpha: float = 0.1, key_col: str = "doc_id",
                     text_col: str = "text",
                     round_to: int = 4) -> DataFrame:
    """The composed CCNet stage: train on ``ref_docs``, score ``docs``."""
    bc, hc, v = train_bigram_lm(ref_docs, text_col=text_col)
    return bigram_perplexity(docs, bc, hc, v, alpha=alpha, key_col=key_col,
                             text_col=text_col, round_to=round_to)
