"""Pure-Python reference engine — the rank-identity oracle.

Plays the role the live Jetty+Solr instance plays in the reference's
end-to-end tests (``core/test/src/org/solrmarc/testUtils/IndexTest.java:
785-833`` spawns a real Solr and asserts query results against it). Here the
oracle is a dict-of-postings BM25 scorer sharing the exact analyzer with the
Spark engine, so any Spark-side divergence is the Spark engine's fault.

BM25 (Lucene/Robertson form, k1=1.2 b=0.75):
    idf(t)  = ln( (N - df + 0.5) / (df + 0.5) + 1 )
    s(t, d) = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
Ties broken by url ascending (the reference sorts score desc then internal
docid; url is our stable doc key).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from typing import Dict, Iterable, List, Sequence, Tuple

from .functions.analyzer import ANALYZERS

K1 = 1.2
B = 0.75


def bm25_idf(n_docs: int, df: int) -> float:
    return math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def bm25_term_score(tf: int, dl: int, avgdl: float, idf: float,
                    k1: float = K1, b: float = B) -> float:
    return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


class OracleIndex:
    """In-memory inverted index + BM25 scorer over (url, text) pairs."""

    def __init__(self, docs: Iterable[Tuple[str, str]], chain: str = "text"):
        self._analyze = ANALYZERS[chain]
        self.postings: Dict[str, Dict[str, int]] = defaultdict(dict)
        self.doclen: Dict[str, int] = {}
        for url, text in docs:
            toks = self._analyze(text)
            self.doclen[url] = len(toks)
            for term, tf in Counter(toks).items():
                self.postings[term][url] = tf
        self.n_docs = len(self.doclen)
        total = sum(self.doclen.values())
        self.avgdl = (total / self.n_docs) if self.n_docs else 0.0

    def score_query(self, query: str) -> Dict[str, float]:
        """All matching docs with full BM25 scores (OR semantics, like the
        reference's edismax default over one field)."""
        scores: Dict[str, float] = defaultdict(float)
        qterms = self._analyze(query)
        # deterministic term order: first occurrence order, duplicates kept
        # once (Lucene dedups identical term queries into boosts; we follow
        # unique-term sum which matches our Spark engine).
        seen = []
        for t in qterms:
            if t not in seen:
                seen.append(t)
        for term in seen:
            plist = self.postings.get(term)
            if not plist:
                continue
            idf = bm25_idf(self.n_docs, len(plist))
            for url, tf in plist.items():
                scores[url] += bm25_term_score(
                    tf, self.doclen[url], self.avgdl, idf
                )
        return dict(scores)

    def topk(self, query: str, k: int = 10) -> List[Tuple[str, float]]:
        scores = self.score_query(query)
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def golden_topk(
    docs: Sequence[Tuple[str, str]],
    queries: Sequence[str],
    k: int = 10,
    chain: str = "text",
) -> List[Tuple[int, int, str, float]]:
    """(qid, rank, url, score) rows — the golden_topk fixture
    (FIXTURES.md §3)."""
    idx = OracleIndex(docs, chain=chain)
    rows: List[Tuple[int, int, str, float]] = []
    for qid, q in enumerate(queries):
        for rank, (url, score) in enumerate(idx.topk(q, k), start=1):
            rows.append((qid, rank, url, score))
    return rows
