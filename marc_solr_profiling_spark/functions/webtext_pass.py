"""Tokenize-once fused webtext pass: ONE scan + ONE Arrow crossing
computing every per-document webtext signal the pipeline needs —
repetition stats, Gopher quality measures/flags, fast64 MinHash
signature slots, benchmark n-gram decontamination counts, and CCNet LM
perplexity — for documents that previously each paid the corpus
tokenization floor separately.

Motivation (measured, BENCH.md round-3 webtext table): at 3.2M docs /
local[32] every standalone text operator above 100 s sits within ~25%
of the ~84 s JVM ``regexp_extract_all`` tokenization cost — five
operators = five regexp passes + five Arrow transfers over the same
bytes.  This pass tokenizes once (the same shared
``textstats.tokens_simple`` JVM expression, so token semantics are
bit-identical to every standalone operator), crosses Arrow once, and
computes all signal families from shared per-batch intermediates:

- one flat ``pd.factorize`` per batch maps every token occurrence to
  its distinct-token index; md5-prefix int64 codes (``lm.
  token_codes_md5`` scheme) are computed once per DISTINCT token per
  worker (memo), then gathered — token identity is therefore identical
  to the LM / decontamination / fast64-MinHash kernels;
- per-document k-gram int64 polynomials (base ``lm.GRAM_POLY_P``) are
  reused across repetition (k=2,5), MinHash shingles (k=3) and
  decontamination grams (k=8);
- the MinHash slot minima run batch-flat via ``np.minimum.reduceat``
  (the ``minhash_signatures(hash_impl="fast64")`` kernel, verbatim
  semantics);
- the benchmark gram set and the LM model arrive as the same
  driver-sized broadcast sorted-hash arrays the standalone operators
  build, probed with ``searchsorted``.

Scale shape: ZERO shuffle, one output row per document with >= 1 token
(the standalone operators' shared drop rule).  Differential equality
against every standalone operator is pytest-enforced
(tests/test_webtext_pass.py).

Reference provenance: this is pipeline composition, not a reference
port — the analog of the profiling battery running every facet in one
pass over one scan (profiling/solr/conf/solrconfig.xml:64-280 battery;
plans/profile.py:profile_facets) applied to the LLM-data operators.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lm import GRAM_POLY_P, token_codes_md5, train_model_arrays
from .textstats import EN_STOPWORDS, GOPHER_DEFAULTS, GOPHER_RULES
from .textstats import tokens_simple


def webtext_signals(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    *,
    stopwords: Optional[list] = None,
    n_hashes: int = 16,
    shingle_n: int = 3,
    bench_docs: Optional[DataFrame] = None,
    decon_n: int = 8,
    ref_docs: Optional[DataFrame] = None,
    alpha: float = 0.1,
    lm_round_to: int = 4,
    nb_pos_docs: Optional[DataFrame] = None,
    nb_neg_docs: Optional[DataFrame] = None,
    nb_alpha: float = 0.5,
    nb_keep_threshold: float = 0.0,
    nb_round_to: int = 4,
    **thresholds,
) -> DataFrame:
    """One fused pass -> one wide row per document (>=1 token):

    ``key, n_tokens, ttr, top2_frac, dup5_frac``  (repetition_signals)
    ``r_too_short .. r_dup5``                     (gopher_quality_flags)
    ``h0 .. h{n_hashes-1}``                       (minhash fast64 slots)
    ``n_grams, n_hit, contaminated``              (benchmark_decontaminate;
                                                  null when ``bench_docs``
                                                  is None)
    ``n_bigrams, ppl``                            (ccnet_perplexity; null
                                                  when ``ref_docs`` is
                                                  None or < 2 tokens)
    ``nb_logratio, nb_keep``                      (nb_quality_score; null
                                                  when ``nb_pos_docs`` /
                                                  ``nb_neg_docs`` is None)

    The NB quality-classifier columns are nearly free here: the hashed
    bucket is the top 12 bits of the md5 token code the kernel already
    computes, so scoring is one gather against the broadcast dense
    log-ratio array plus a batch-flat ``np.add.reduceat`` — the
    standalone operator's whole corpus pass (~141 s at 3.2M docs, the
    md5-coding floor) collapses into this scan.
    """
    import numpy as np
    import pandas as pd

    thr = {**GOPHER_DEFAULTS, **thresholds}
    sw_set = frozenset(EN_STOPWORDS if stopwords is None else stopwords)
    key_t = docs.select(key_col).schema.fields[0].dataType.simpleString()
    spark = docs.sparkSession

    # ---- driver-sized broadcast sides (identical to the standalone ops)
    bc_bench = None
    if bench_docs is not None:
        from ..operators.dedup import _doc_gram_hashes_kernel

        bench_rows = _doc_gram_hashes_kernel(
            bench_docs, decon_n, text_col, key_col=None
        ).select(F.explode("hs").alias("h")).distinct().collect()
        bench_set = np.sort(
            np.array([r.h for r in bench_rows], dtype=np.int64))
        bc_bench = spark.sparkContext.broadcast(bench_set)

    bc_lm = None
    if ref_docs is not None:
        bc_lm = spark.sparkContext.broadcast(
            train_model_arrays(ref_docs, text_col))

    bc_nb = None
    if nb_pos_docs is not None and nb_neg_docs is not None:
        from .quality_classifier import _logratio_array, train_nb_model

        p, n_p, g, n_g = train_nb_model(nb_pos_docs, nb_neg_docs, text_col)
        bc_nb = spark.sparkContext.broadcast(
            _logratio_array(p, n_p, g, n_g, nb_alpha))

    base = docs.select(
        F.col(key_col), F.col(text_col).alias("_text"),
        tokens_simple(text_col).alias("tk"),
    ).filter(F.size("tk") > 0)

    import re as _re

    punct_re = _re.compile(r"[^a-zA-Z0-9\s]", _re.ASCII)
    P = np.int64(GRAM_POLY_P)
    C1 = np.uint64(0xBF58476D1CE4E5B9)
    C2 = np.uint64(0x94D049BB133111EB)
    MASK = 0xFFFFFFFFFFFFFFFF
    a = float(alpha)

    def rnd(x: float, d: int) -> float:
        return float(np.floor(x * 10**d + 0.5) / 10**d)

    def grams(c: "np.ndarray", k: int) -> "np.ndarray":
        """int64 polynomial k-grams with the shared whole-stream
        fallback for docs shorter than k (gram-hash kernel semantics)."""
        m = len(c) - k + 1
        if m <= 0:
            g = c[:1].copy()
            for j in range(1, len(c)):
                g = g * P + c[j:j + 1]
            return g
        g = c[:m].copy()
        for j in range(1, k):
            g = g * P + c[j:j + m]
        return g

    def lookup(sorted_h, vals, query):
        if len(sorted_h) == 0:
            return np.zeros(len(query), dtype=np.int64)
        pos = np.searchsorted(sorted_h, query)
        pos[pos >= len(sorted_h)] = len(sorted_h) - 1
        return np.where(sorted_h[pos] == query, vals[pos], 0)

    def kernel(batches):
        memo: dict = {}
        for pdf in batches:
            nrows = len(pdf)
            if nrows == 0:
                continue
            # ---- batch-flat tokenize-once bookkeeping ----------------
            tok_lists = [np.asarray(t, dtype=object) for t in pdf["tk"]]
            lens = np.fromiter((len(t) for t in tok_lists),
                               dtype=np.int64, count=nrows)
            flat = np.concatenate(tok_lists)
            # one factorize per batch; md5 only for distinct tokens
            fcodes, uniq = pd.factorize(flat, sort=False)
            uniq_c64 = token_codes_md5(uniq, memo)
            c64_flat = uniq_c64[fcodes]
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))

            out = {key_col: pdf[key_col].to_numpy()}
            n_tok = lens
            out["n_tokens"] = n_tok

            # NB quality score: bucket = top 12 bits of the md5 code the
            # batch already carries; one gather + one reduceat, no loop
            if bc_nb is not None:
                lr_uniq = bc_nb.value[
                    (uniq_c64.view(np.uint64)
                     >> np.uint64(52)).astype(np.int64)]
                nb_sums = np.round(
                    np.add.reduceat(lr_uniq[fcodes], starts), nb_round_to)
                out["nb_logratio"] = nb_sums
                out["nb_keep"] = nb_sums > nb_keep_threshold
            else:
                out["nb_logratio"] = np.full(nrows, None, dtype=object)
                out["nb_keep"] = np.full(nrows, None, dtype=object)

            ttr = np.empty(nrows)
            top2 = np.empty(nrows)
            dup5 = np.empty(nrows)
            mwl = np.empty(nrows)
            dsw = np.empty(nrows, dtype=np.int64)
            punct = np.empty(nrows)
            mh_parts = []          # per-doc distinct shingle hashes
            ng = np.empty(nrows, dtype=np.int64)
            nh = np.empty(nrows, dtype=np.int64)
            nbg = np.empty(nrows, dtype=np.int64)
            ppl = np.full(nrows, np.nan)

            bs = bc_bench.value if bc_bench is not None else None
            if bc_lm is not None:
                bh, bcnt, hh, hcnt, V = bc_lm.value
                aV = a * V

            texts = pdf["_text"]
            for i in range(nrows):
                s, n = starts[i], lens[i]
                c = c64_flat[s:s + n]
                tk = tok_lists[i]
                text = texts.iloc[i] or ""

                # repetition (token identity = md5 codes, same collision
                # trade as every other kernel)
                distinct = len(np.unique(c))
                ttr[i] = rnd(distinct / n, 6)
                for k, slot in ((2, top2), (5, dup5)):
                    m = n - k + 1
                    if m <= 0:
                        slot[i] = 0.0
                        continue
                    _, counts = np.unique(grams(c, k), return_counts=True)
                    top = (counts.max() if k == 2
                           else counts[counts >= 2].sum())
                    slot[i] = rnd(top / m, 6)

                # gopher measures
                mwl[i] = sum(map(len, tk)) / n
                dsw[i] = len(sw_set.intersection(tk))
                n_chars = len(text)
                punct[i] = (len(punct_re.findall(text)) / n_chars
                            if n_chars else 0.0)

                # minhash shingles (distinct) — minima taken batch-flat
                mh_parts.append(np.unique(grams(c, shingle_n)))

                # decontamination probe
                hs = np.unique(grams(c, decon_n))
                ng[i] = len(hs)
                if bs is not None and len(bs):
                    pos = np.searchsorted(bs, hs)
                    pos[pos >= len(bs)] = len(bs) - 1
                    nh[i] = int((bs[pos] == hs).sum())
                else:
                    nh[i] = 0

                # lm perplexity
                if bc_lm is not None and n >= 2:
                    g = c[:-1] * P + c[1:]
                    c2 = lookup(bh, bcnt, g)
                    c1 = lookup(hh, hcnt, c[:-1])
                    logp = np.log((c2 + a) / (c1 + aV))
                    nbg[i] = len(g)
                    ppl[i] = rnd(float(np.exp(-logp.mean())), lm_round_to)
                else:
                    nbg[i] = 0

            out["ttr"], out["top2_frac"], out["dup5_frac"] = ttr, top2, dup5
            out["mwl"], out["dsw"], out["punct"] = mwl, dsw, punct

            # fast64 MinHash minima: one flat remix + reduceat per slot
            mh_lens = np.fromiter((len(h) for h in mh_parts),
                                  dtype=np.int64, count=nrows)
            mh_flat = np.concatenate(mh_parts).view(np.uint64)
            mh_starts = np.concatenate(([0], np.cumsum(mh_lens)[:-1]))
            for i in range(n_hashes):
                x = mh_flat ^ np.uint64(
                    (0x9E3779B97F4A7C15 * (i + 1)) & MASK)
                x = (x ^ (x >> np.uint64(30))) * C1
                x = (x ^ (x >> np.uint64(27))) * C2
                x ^= x >> np.uint64(31)
                out[f"h{i}"] = np.minimum.reduceat(
                    x, mh_starts).view(np.int64)

            out["n_grams"], out["n_hit"] = ng, nh
            out["contaminated"] = (
                nh > 0 if bs is not None
                else np.full(nrows, None, dtype=object))
            out["n_bigrams"] = nbg
            # NaN -> null so "no model / too short" is absent, not NaN
            out["ppl"] = np.where(np.isnan(ppl), None, ppl.astype(object))
            yield pd.DataFrame(out)

    hcols = ", ".join(f"h{i} long" for i in range(n_hashes))
    meas = base.mapInPandas(
        kernel,
        schema=(f"{key_col} {key_t}, n_tokens long, ttr double, "
                "top2_frac double, dup5_frac double, mwl double, "
                f"dsw int, punct double, {hcols}, n_grams long, "
                "n_hit long, contaminated boolean, n_bigrams long, "
                "ppl double, nb_logratio double, nb_keep boolean"),
    )
    # gopher flags as cheap post-kernel column expressions
    flagged = meas.select(
        "*",
        (F.col("n_tokens") < thr["min_tokens"]).alias("r_too_short"),
        (F.col("n_tokens") > thr["max_tokens"]).alias("r_too_long"),
        ((F.col("mwl") < thr["min_mean_word_len"])
         | (F.col("mwl") > thr["max_mean_word_len"])).alias("r_word_len"),
        (F.col("dsw") < thr["min_distinct_stopwords"]).alias("r_stopwords"),
        (F.col("punct") > thr["max_punct_ratio"]).alias("r_punct"),
        (F.col("top2_frac") > thr["max_top2_frac"]).alias("r_top2"),
        (F.col("dup5_frac") > thr["max_dup5_frac"]).alias("r_dup5"),
    )
    order = (
        [key_col, "n_tokens", "ttr", "top2_frac", "dup5_frac"]
        + GOPHER_RULES
        + [f"h{i}" for i in range(n_hashes)]
        + ["n_grams", "n_hit", "contaminated", "n_bigrams", "ppl",
           "nb_logratio", "nb_keep"]
    )
    return flagged.select(*order)
