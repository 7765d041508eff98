"""Query-time top-k over the compressed physical index.

Spark restatement of the reference's search handler (``solrconfig.xml:
64-83``: relevance top-k, rows=20, sort=score desc): query terms are
analyzed with the index's own chain, their idfs come from the dictionary
(a driver-side lookup of a handful of terms), and matching posting blocks
are scored inside ``mapInPandas`` with a bounded per-partition top-k —
the per-partition min-heap of the north star — then merged globally
(k rows per partition, TakeOrdered at the driver).

Partitioning invariant that makes this work: blocks are salted by
hash(doc_id), so every query term's postings for a given document share a
salt. Repartitioning matched blocks by salt therefore co-locates complete
per-document score contributions — each partition computes exact totals
for its doc subset independently. No cross-partition accumulation exists.

Block-max usage: each block stores max_wnorm (idf-independent score cap).
For single-term queries the scorer processes blocks in descending
idf*max_wnorm order and stops as soon as the next block's cap can't beat
the current k-th score (classic block-max early exit — exact). For
multi-term queries blocks whose cap sum across terms can't reach the k-th
score of an initial high-cap pass are skipped conservatively only when a
doc appears in no processed block (full document-at-a-time WAND pointer
walk is a later refinement; the current multi-term path scores all matched
blocks vectorized, which is exact).

Scores are float64 and term contributions are summed in ascending term
order per doc (deterministic summation order; SURVEY.md §7 risk 2).
"""

from __future__ import annotations

import math
from typing import Iterator, List, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.analyzer import ANALYZERS
from ..oracle import bm25_idf
from .varbyte import delta_decode, varbyte_decode

K1 = 1.2
B = 0.75


def _analyze_query(query: str, chain: str) -> List[str]:
    out: List[str] = []
    for t in ANALYZERS[chain](query):
        if t not in out:
            out.append(t)
    return out



def _topk_exact(uniq: np.ndarray, totals: np.ndarray, k: int):
    """Exact top-k selection with (score desc, doc_id asc) tie-break.

    argpartition narrows to the score threshold first (O(n)), then ALL docs
    at-or-above the k-th score enter the final lexsort — so ties at the
    boundary resolve by doc_id exactly like a full sort would (duplicate
    documents produce identical scores; dropping an arbitrary tie would
    break rank-identity with the oracle)."""
    if uniq.size <= k:
        sel = np.lexsort((uniq, -totals))
        return sel
    thresh = np.partition(totals, uniq.size - k)[uniq.size - k]
    idx = np.flatnonzero(totals >= thresh)
    order = np.lexsort((uniq[idx], -totals[idx]))[:k]
    return idx[order]


def _score_blocks_numpy(
    pdf: pd.DataFrame,
    idf_by_term: dict[str, float],
    k: int,
    avgdl: float,
    single_term: bool,
) -> tuple[np.ndarray, np.ndarray]:
    """Score one partition's blocks; return (doc_ids, scores) of its top-k.

    Vectorized: decode -> per-posting wnorm -> idf weight -> accumulate by
    doc via sort+reduce. Single-term fast path: process blocks by
    descending cap with exact early exit.
    """
    if single_term:
        pdf = pdf.assign(
            _cap=[idf_by_term[t] * m for t, m in zip(pdf["term"], pdf["max_wnorm"])]
        ).sort_values("_cap", ascending=False)

    ids_parts: list[np.ndarray] = []
    score_parts: list[np.ndarray] = []
    kth_best = -math.inf
    n_seen = 0
    for row in pdf.itertuples(index=False):
        idf = idf_by_term[row.term]
        # strict <: a block whose cap EQUALS the k-th score may still hold a
        # tied doc with a smaller doc_id, which tie-break must consider
        if single_term and n_seen >= k and idf * row.max_wnorm < kth_best:
            break  # exact early exit: no remaining block can beat the heap
        ids = delta_decode(row.doc_gaps).astype(np.int64)
        tfs = varbyte_decode(row.tfs).astype(np.float64)
        dls = varbyte_decode(row.dls).astype(np.float64)
        w = idf * tfs * (K1 + 1.0) / (tfs + K1 * (1.0 - B + B * dls / avgdl))
        ids_parts.append(ids)
        score_parts.append(w)
        n_seen += ids.size
        if single_term and n_seen >= k:
            all_s = np.concatenate(score_parts)
            if all_s.size >= k:
                kth_best = np.partition(all_s, -k)[-k]
    if not ids_parts:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    all_ids = np.concatenate(ids_parts)
    all_scores = np.concatenate(score_parts)
    # accumulate per doc (terms contribute in deterministic decode order)
    uniq, inv = np.unique(all_ids, return_inverse=True)
    totals = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(totals, inv, all_scores)
    sel = _topk_exact(uniq, totals, k)
    return uniq[sel], totals[sel]


def wand_topk(
    index,
    query: str,
    k: int = 10,
    with_url: bool = True,
) -> DataFrame:
    """Top-k (doc_id, score[, url]) for one query over a built index."""
    spark = index.spark
    qterms = _analyze_query(query, index.chain)
    empty = spark.createDataFrame([], "doc_id long, score double")
    if not qterms:
        return empty
    drows = index.dictionary.filter(F.col("term").isin(qterms)).collect()
    # (few terms: a literal In is fine here; the batch path broadcast-joins)
    if not drows:
        return empty
    idf_by_term = {
        r["term"]: bm25_idf(index.n_docs, int(r["df"])) for r in drows
    }
    avgdl = index.avgdl
    single = len(idf_by_term) == 1
    kk = int(k)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lst = list(batches)
        if not lst:
            return
        pdf = pd.concat(lst, ignore_index=True)
        if len(pdf) == 0:
            return
        ids, scores = _score_blocks_numpy(pdf, idf_by_term, kk, avgdl, single)
        yield pd.DataFrame({"doc_id": ids, "score": scores})

    matched = index.segments.filter(F.col("term").isin(list(idf_by_term)))
    # co-locate complete doc contributions: one partition per salt
    candidates = matched.repartition("salt").mapInPandas(
        score, schema="doc_id long, score double"
    )
    topk = candidates.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    if with_url:
        topk = topk.join(index.docs.select("doc_id", "url"), "doc_id", "left")
        topk = topk.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk


def wand_topk_batch(
    index,
    queries: Sequence[str],
    k: int = 10,
) -> DataFrame:
    """Many queries in one pass: (qid, doc_id, score, rank).

    One segment scan serves all queries (the batch query driver of
    SURVEY.md §M3): blocks matching ANY query term are repartitioned by
    salt once; each partition scores every query against its doc subset;
    a window rank per qid keeps k rows.
    """
    spark = index.spark
    per_q_terms: dict[int, List[str]] = {
        qid: _analyze_query(q, index.chain) for qid, q in enumerate(queries)
    }
    all_terms = sorted({t for ts in per_q_terms.values() for t in ts})
    if not all_terms:
        return spark.createDataFrame(
            [], "qid int, doc_id long, score double, rank int"
        )
    # broadcast-join, NOT isin: a literal In over thousands of query terms
    # generates enormous codegen (multi-second compile); a broadcast hash
    # join keeps the probe per-row and the plan small
    qterms_df = spark.createDataFrame([(t,) for t in all_terms], "term string")
    drows = index.dictionary.join(F.broadcast(qterms_df), "term").collect()
    idf_by_term = {r["term"]: bm25_idf(index.n_docs, int(r["df"])) for r in drows}
    avgdl = index.avgdl
    kk = int(k)
    qid_terms = {
        qid: [t for t in ts if t in idf_by_term]
        for qid, ts in per_q_terms.items()
    }

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lst = list(batches)
        if not lst:
            return
        pdf = pd.concat(lst, ignore_index=True)
        if len(pdf) == 0:
            return
        # decode each block once, bucket postings by term
        by_term: dict[str, list] = {}
        for row in pdf.itertuples(index=False):
            ids = delta_decode(row.doc_gaps).astype(np.int64)
            tfs = varbyte_decode(row.tfs).astype(np.float64)
            dls = varbyte_decode(row.dls).astype(np.float64)
            w = (
                idf_by_term[row.term] * tfs * (K1 + 1.0)
                / (tfs + K1 * (1.0 - B + B * dls / avgdl))
            )
            by_term.setdefault(row.term, []).append((ids, w))
        term_arrays = {
            t: (
                np.concatenate([x[0] for x in parts]),
                np.concatenate([x[1] for x in parts]),
            )
            for t, parts in by_term.items()
        }
        out_qid, out_ids, out_scores = [], [], []
        for qid, terms in qid_terms.items():
            terms = [t for t in terms if t in term_arrays]
            if not terms:
                continue
            ids = np.concatenate([term_arrays[t][0] for t in terms])
            ws = np.concatenate([term_arrays[t][1] for t in terms])
            uniq, inv = np.unique(ids, return_inverse=True)
            totals = np.zeros(uniq.size, dtype=np.float64)
            np.add.at(totals, inv, ws)
            sel = _topk_exact(uniq, totals, kk)
            out_qid.append(np.full(sel.size, qid, dtype=np.int32))
            out_ids.append(uniq[sel])
            out_scores.append(totals[sel])
        if not out_qid:
            return
        yield pd.DataFrame(
            {
                "qid": np.concatenate(out_qid),
                "doc_id": np.concatenate(out_ids),
                "score": np.concatenate(out_scores),
            }
        )

    hit_df = spark.createDataFrame(
        [(t,) for t in idf_by_term], "term string"
    )
    matched = index.segments.join(F.broadcast(hit_df), "term")
    candidates = matched.repartition("salt").mapInPandas(
        score, schema="qid int, doc_id long, score double"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("qid", "rank")
    )
