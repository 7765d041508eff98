"""Solr ``mm`` (minimum-should-match) spec grammar.

The reference's default search handler does not pass an integer ``mm`` —
it passes the conditional spec ``6<-1 6<90%``
(``profiling/solr/conf/solrconfig.xml:72``), whose semantics are defined
by Solr's ``SolrPluginUtils.calculateMinShouldMatch`` (Apache Solr,
public): given ``n`` optional clauses,

* a bare integer ``k`` means "at least k" (negative: "at most k missing",
  i.e. ``n + k``);
* a percentage ``p%`` means ``int(n * p/100)`` truncated toward zero
  (negative percent: ``n + int(n * p/100)`` — "at most p% missing");
* conditional clauses ``u<expr`` are evaluated LEFT TO RIGHT: if
  ``n <= u`` the current result (initially ``n`` — all required) is
  returned immediately; otherwise the result becomes ``expr`` evaluated
  as a simple spec and scanning continues with the next clause;
* the final result clamps to ``[0, n]``.

So ``6<-1 6<90%`` reads: "up to 6 terms — require all; above 6 — require
90% (the later clause wins when both fire)". This module re-implements
that contract from the documented behavior (Solr ref guide,
"mm (Minimum Should Match) Parameter") — no Solr code consulted.
"""

from __future__ import annotations

import re

_COND = re.compile(r"\s*<\s*")
_WS = re.compile(r"\s+")


def _simple(spec: str, n: int) -> int:
    """A non-conditional spec against ``n`` optional clauses (no clamp —
    clamping happens once, at the end, like Solr)."""
    spec = spec.strip()
    if spec.endswith("%"):
        pct = int(spec[:-1])
        calc = int(n * pct / 100.0)  # int() truncates toward zero
        return n + calc if calc < 0 else calc
    calc = int(spec)
    return n + calc if calc < 0 else calc


def parse_mm_spec(spec: str | int, n_terms: int) -> int:
    """Resolve an ``mm`` spec to the concrete minimum-match count for a
    query with ``n_terms`` optional (distinct, analyzed) terms.

    Accepts an ``int`` passthrough so call sites can take
    ``min_match: int | str`` uniformly.

    >>> parse_mm_spec("6<-1 6<90%", 4)   # n <= 6: all required
    4
    >>> parse_mm_spec("6<-1 6<90%", 10)  # n > 6: last firing clause, 90%
    9
    >>> parse_mm_spec("75%", 4)
    3
    >>> parse_mm_spec("-25%", 4)
    3
    >>> parse_mm_spec("-2", 5)
    3
    >>> parse_mm_spec("2<-25% 9<-3", 10)
    7
    """
    if isinstance(spec, int):
        return max(0, min(spec, n_terms))
    n = int(n_terms)
    s = spec.strip()
    if not s:
        raise ValueError("empty mm spec")
    result = n
    if "<" in s:
        s = _COND.sub("<", s)
        for clause in _WS.split(s):
            parts = clause.split("<", 1)
            if len(parts) != 2 or not parts[0] or not parts[1]:
                raise ValueError(f"malformed mm conditional clause: {clause!r}")
            upper = int(parts[0])
            if n <= upper:
                return max(0, min(result, n))
            result = _simple(parts[1], n)
        return max(0, min(result, n))
    result = _simple(s, n)
    return max(0, min(result, n))
