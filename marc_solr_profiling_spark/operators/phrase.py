"""Positional phrase top-k over the compressed physical index.

The physical-index form of Lucene's ``PhraseQuery`` (slop 0) — the
capability behind the reference's edismax phrase parameters
(``solrconfig.xml:68-82`` ``qs``/``ps``; Lucene stores the .pos file the
reference relies on). The scan-side twin is
:func:`..operators.bm25.phrase_match_expr`; this module answers the same
query from a ``build_index(..., positions=True)`` index without touching
raw text.

Execution shape (per the salted-partition invariant of wand.py: all of a
doc's postings share its salt, so each salt scores independently):

  1. The phrase's terms' blocks are repartitioned by salt (ONE shuffle of
     compressed blocks, no re-tokenization).
  2. Within a salt, the RAREST term's postings are decoded first; every
     other term then decodes only the blocks whose [first_doc, last_doc]
     range contains a surviving candidate — the positional analog of the
     WAND candidate-containment skip, so a stopword inside a phrase never
     decodes its full posting list.
  3. Candidates that contain every term are verified for adjacency by
     chained position-set intersection (S <- intersect(S + 1, pos(t)));
     matches are scored with BM25 over the phrase's distinct terms using
     CORPUS-wide stats (Lucene scores phrase-filtered queries with global
     idf/avgdl).
  4. Bounded per-partition top-k, then a global (score desc, doc_id asc)
     merge of <= k rows per partition.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.analyzer import ANALYZERS
from ..oracle import bm25_idf
from .segments import decode_block_positions
from .varbyte import delta_decode, varbyte_decode
from .wand import B, K1, _by_salt, _topk_exact


def _decode_term(
    sub: pd.DataFrame, cand: np.ndarray | None
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Decode one (term, salt)'s blocks — only those whose doc range
    contains a candidate when ``cand`` is given. Blocks are disjoint and
    doc-sorted within a (term, salt) group, so the concatenated output
    stays ascending. Returns (ids, tfs, dls, flat_pos, pos_starts)."""
    first = sub["first_doc"].to_numpy(dtype=np.int64)
    order = np.argsort(first, kind="stable")
    rows = sub.iloc[order]
    if cand is not None:
        f = rows["first_doc"].to_numpy(dtype=np.int64)
        l = rows["last_doc"].to_numpy(dtype=np.int64)
        lo = np.searchsorted(cand, f, side="left")
        hi = np.searchsorted(cand, l, side="right")
        rows = rows.iloc[np.flatnonzero(lo < hi)]
    ids_p, tf_p, dl_p, pos_p, st_p = [], [], [], [], []
    base = 0
    for row in rows.itertuples(index=False):
        ids = delta_decode(row.doc_gaps).astype(np.int64)
        tfs = varbyte_decode(row.tfs).astype(np.int64)
        dls = varbyte_decode(row.dls).astype(np.float64)
        flat, starts = decode_block_positions(row.positions, tfs)
        ids_p.append(ids)
        tf_p.append(tfs)
        dl_p.append(dls)
        pos_p.append(flat)
        st_p.append(starts + base)
        base += flat.size
    if not ids_p:
        e = np.empty(0, dtype=np.int64)
        return e, e, e.astype(np.float64), e, e
    return (
        np.concatenate(ids_p),
        np.concatenate(tf_p),
        np.concatenate(dl_p),
        np.concatenate(pos_p),
        np.concatenate(st_p),
    )


def phrase_topk(
    index,
    phrase: str,
    k: int = 10,
    with_url: bool = False,
    round_to: int | None = None,
    slop: int = 0,
) -> DataFrame:
    """Top-k (doc_id, score[, url]) of docs containing ``phrase`` as an
    exact token adjacency (``slop=0``) or an ordered sloppy match within
    a ``(m-1)+slop`` position window (``slop>0`` — the in-order subset of
    Lucene's sloppy phrase, exact for the reference's ``qs=1``), scored
    by BM25 over the phrase's distinct terms.

    ``round_to``: round scores (half-up, matching Spark/DuckDB ``round``)
    BEFORE ranking, inside the scorer — stopword-bearing phrases produce
    many docs whose scores differ only in trailing ulps, and the oracle
    contract resolves such ties by doc_id at the rounded precision; raw
    float ranking would pick a different (non-deterministic across fp
    association) set.

    Requires an index built with ``positions=True``."""
    if not getattr(index, "has_positions", False):
        raise ValueError(
            "phrase_topk needs a positional index "
            "(build_index(..., positions=True))"
        )
    spark = index.spark
    # full ORDERED sequence (duplicates kept — "buffalo buffalo" must
    # require two adjacent occurrences); distinct set only for lookups
    seq_terms = list(ANALYZERS[index.chain](phrase))
    empty = spark.createDataFrame([], "doc_id long, score double")
    if not seq_terms:
        return empty
    uniq_terms = list(dict.fromkeys(seq_terms))
    drows = index.cached_dictionary().filter(
        F.col("term").isin(uniq_terms)
    ).collect()
    if len(drows) < len(uniq_terms):
        # conjunction: a phrase term absent from the corpus matches nothing
        return empty
    idf_by_term = {
        r["term"]: bm25_idf(index.n_docs, int(r["df"])) for r in drows
    }
    avgdl = index.avgdl
    kk = int(k)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lst = list(batches)
        if not lst:
            return
        pdf = pd.concat(lst, ignore_index=True)
        if len(pdf) == 0:
            return
        id_parts, score_parts = [], []
        for _, salt_pdf in pdf.groupby("salt", sort=False):
            by_term = {
                t: sub for t, sub in salt_pdf.groupby("term", sort=False)
            }
            if len(by_term) < len(uniq_terms):
                continue
            # rarest-first decode order: each later term only decodes
            # blocks containing a still-alive candidate
            sizes = {
                t: int(sub["n_postings"].sum()) for t, sub in by_term.items()
            }
            decode_order = sorted(uniq_terms, key=lambda t: sizes[t])
            decoded: dict[str, tuple] = {}
            cand = None
            for t in decode_order:
                d = _decode_term(by_term[t], cand)
                decoded[t] = d
                cand = d[0] if cand is None else cand[
                    np.isin(cand, d[0], assume_unique=True)
                ]
                if cand.size == 0:
                    break
            if cand is None or cand.size == 0:
                continue
            # adjacency verification per candidate doc: chained
            # intersect(S + 1, pos(t)) over the phrase's term sequence
            lookup = {}
            for t, (ids, tfs, dls, flat, starts) in decoded.items():
                idx = np.searchsorted(ids, cand)
                lookup[t] = (idx, tfs, dls, flat, starts)
            keep = np.zeros(cand.size, dtype=bool)
            window = len(seq_terms) - 1 + slop
            for ci in range(cand.size):
                t0 = seq_terms[0]
                idx, tfs, _, flat, starts = lookup[t0]
                j = idx[ci]
                s = flat[starts[j]: starts[j] + tfs[j]]
                if slop == 0:
                    # exact adjacency: chained intersect(S + 1, pos(t))
                    ok = True
                    for t in seq_terms[1:]:
                        idx, tfs, _, flat, starts = lookup[t]
                        j = idx[ci]
                        nxt = flat[starts[j]: starts[j] + tfs[j]]
                        s = np.intersect1d(s + 1, nxt, assume_unique=True)
                        if s.size == 0:
                            ok = False
                            break
                    keep[ci] = ok
                    continue
                # sloppy: ordered-chain DP — for each position q of term
                # j, carry the MAXIMAL chain start reachable (prefix-max
                # over predecessors p < q); match iff some final q has
                # q - start <= window
                cur_pos, cur_start = s, s
                ok = cur_pos.size > 0
                for t in seq_terms[1:]:
                    idx, tfs, _, flat, starts = lookup[t]
                    j = idx[ci]
                    q = flat[starts[j]: starts[j] + tfs[j]]
                    prefmax = np.maximum.accumulate(cur_start)
                    kk_ = np.searchsorted(cur_pos, q, side="left") - 1
                    valid = kk_ >= 0
                    q = q[valid]
                    if q.size == 0:
                        ok = False
                        break
                    cur_start = prefmax[kk_[valid]]
                    cur_pos = q
                keep[ci] = ok and bool(
                    np.any(cur_pos - cur_start <= window)
                )
            matched = cand[keep]
            if matched.size == 0:
                continue
            # BM25 over distinct terms, corpus-wide stats
            totals = np.zeros(matched.size)
            sel = np.flatnonzero(keep)
            for t in uniq_terms:
                idx, tfs, dls, _, _ = lookup[t]
                j = idx[sel]
                tf = tfs[j].astype(np.float64)
                dl = dls[j]
                totals += (
                    idf_by_term[t] * tf * (K1 + 1.0)
                    / (tf + K1 * (1.0 - B + B * dl / avgdl))
                )
            if round_to is not None:
                scale = 10.0 ** round_to
                totals = np.floor(totals * scale + 0.5) / scale
            top = _topk_exact(matched, totals, kk)
            id_parts.append(matched[top])
            score_parts.append(totals[top])
        if not id_parts:
            return
        all_ids = np.concatenate(id_parts)
        all_scores = np.concatenate(score_parts)
        sel = _topk_exact(all_ids, all_scores, kk)
        yield pd.DataFrame(
            {"doc_id": all_ids[sel], "score": all_scores[sel]}
        )

    matched = index.segments.filter(F.col("term").isin(uniq_terms))
    candidates = _by_salt(matched, index).mapInPandas(
        score, schema="doc_id long, score double"
    )
    topk = candidates.orderBy(F.desc("score"), F.asc("doc_id")).limit(kk)
    if with_url:
        topk = topk.join(index.docs.select("doc_id", "url"), "doc_id", "left")
        topk = topk.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk
