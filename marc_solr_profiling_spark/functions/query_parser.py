"""Lucene/Solr query-STRING parser — the front door that turns the
reference's user-facing query syntax into this engine's structured
BM25-plan parameters.

The reference serves queries through Solr request handlers whose
``defType`` is ``lucene`` (the classic ``SolrQueryParser`` /
``QueryParserBase`` grammar; ``test/solr/conf/solrconfig.xml:71``,
``SolrReIndexer.java:34`` "a reqHandler with deftype lucene (uses
Lucene QueryParser)") or ``dismax`` (``solrconfig.xml:81``). Every
CLAUSE TYPE that grammar produces against a single field already has a
structured, oracle-verified analog in
:func:`~..operators.bm25.bm25_topk_sql_plan`; this module parses the
flat surface syntax into those parameters so a query arrives as ONE
string, exactly as it does over the reference's HTTP interface:

==========================  =============================================
syntax                      structured parameter
==========================  =============================================
``word``                    ``query`` (optional SHOULD clause)
``word^2.5``                ``term_boosts`` (clause boost, scores * 2.5)
``+word``                   ``require_query`` (MUST: gates AND scores)
``-word`` / ``NOT word``    ``exclude_query`` (MUST_NOT)
``"a phrase"`` / ``"..."~N``  ``phrase`` + ``phrase_slop``
``pre*``                    ``wildcard`` (CONSTANT_SCORE_REWRITE prefix)
``[lo TO hi]``              ``term_range`` (inclusive TermRangeQuery)
``word~`` / ``word~N``      fuzzy clause (dispatched to the fuzzy plan)
``a AND b`` (uniform)       ``min_match='100%'`` (q.op=AND conjunction)
``a OR b`` (uniform)        ``min_match=None`` (pure disjunction)
==========================  =============================================

Deliberately OUT of scope, rejected loudly (``QueryStringError``), never
silently dropped: field-qualified terms (``title:foo`` — this is the
single-field engine; multi-field routing is the edismax ``qf`` surface
in ``plans/multifield.py``), grouping parens (Lucene's flat
BooleanQuery makes mixed ``AND``/``OR`` without parens notoriously
ill-defined — we accept only uniform-operator strings), leading
wildcards, and escaped special characters.

Parsing is driver-side string work on a query (bytes, not data) — scale
cost zero; every produced parameter feeds the existing Catalyst plans.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


class QueryStringError(ValueError):
    """Raised for syntax this parser refuses to guess about."""


@dataclass
class ParsedQuery:
    """Structured form of a Lucene query string (single-field subset)."""

    should_terms: list = field(default_factory=list)
    term_boosts: dict = field(default_factory=dict)
    require_terms: list = field(default_factory=list)
    exclude_terms: list = field(default_factory=list)
    phrase: "str | None" = None
    phrase_slop: int = 0
    wildcards: list = field(default_factory=list)
    term_range: "tuple[str, str] | None" = None
    fuzzy: list = field(default_factory=list)  # [(term, max_edits)]
    min_match: "str | None" = None

    def plan_kwargs(self) -> dict:
        """Keyword arguments for ``bm25_topk_sql_plan``. Raises if the
        query holds fuzzy clauses (those dispatch to the fuzzy plan —
        see ``bm25_query_string_topk``)."""
        if self.fuzzy:
            raise QueryStringError(
                "fuzzy clauses mixed with other clause types are not "
                "supported; a fuzzy-only query dispatches to "
                "bm25_fuzzy_topk_plan"
            )
        kw: dict = {"query": " ".join(self.should_terms)}
        if self.term_boosts:
            kw["term_boosts"] = dict(self.term_boosts)
        if self.require_terms:
            kw["require_query"] = " ".join(self.require_terms)
        if self.exclude_terms:
            kw["exclude_query"] = " ".join(self.exclude_terms)
        if self.phrase is not None:
            kw["phrase"] = self.phrase
            kw["phrase_slop"] = self.phrase_slop
        if self.wildcards:
            kw["wildcard"] = list(self.wildcards)
        if self.term_range is not None:
            kw["term_range"] = self.term_range
        if self.min_match is not None:
            kw["min_match"] = self.min_match
        return kw


_PHRASE_RE = re.compile(r'"([^"]*)"(?:~(\d+))?')
_RANGE_RE = re.compile(r"\[(\S+)\s+TO\s+(\S+)\]")
_BOOST_RE = re.compile(r"^(.*)\^(\d+(?:\.\d+)?)$")
_FUZZY_RE = re.compile(r"^(.*?)~(\d*)$")


def parse_query_string(q: str) -> ParsedQuery:
    """Parse a flat Lucene query string into :class:`ParsedQuery`.

    Tokens are split on whitespace AFTER phrases (quoted spans) and
    ``[lo TO hi]`` ranges are lifted out, so spaces inside those
    constructs survive. Occur prefixes (``+``/``-``) bind tighter than
    suffix modifiers (``^boost``, ``~fuzzy``, trailing ``*``), matching
    ``QueryParserBase``'s clause grammar.
    """
    if not isinstance(q, str) or not q.strip():
        raise QueryStringError("empty query string")
    for ch in "(){}":
        if ch in q:
            raise QueryStringError(
                f"grouping/brace syntax {ch!r} not supported: only flat "
                "(uniform-operator) BooleanQuery strings are accepted"
            )
    if "\\" in q:
        raise QueryStringError("escape sequences not supported")

    pq = ParsedQuery()
    rest = q

    def _take_range(m: "re.Match") -> str:
        if pq.term_range is not None:
            raise QueryStringError("at most one [lo TO hi] range clause")
        lo, hi = m.group(1).lower(), m.group(2).lower()
        pq.term_range = (lo, hi)
        return " "

    rest = _RANGE_RE.sub(_take_range, rest)

    def _take_phrase(m: "re.Match") -> str:
        if pq.phrase is not None:
            raise QueryStringError(
                "at most one phrase clause per query (the structured "
                "plan applies the phrase as a single match filter)"
            )
        pq.phrase = m.group(1)
        pq.phrase_slop = int(m.group(2)) if m.group(2) else 0
        return " "

    rest = _PHRASE_RE.sub(_take_phrase, rest)
    if '"' in rest:
        raise QueryStringError("unbalanced quote in query string")

    saw_and = saw_or = False
    negate_next = False
    for tok in rest.split():
        if tok == "AND":
            saw_and = True
            continue
        if tok == "OR":
            saw_or = True
            continue
        if tok == "NOT":
            negate_next = True
            continue
        occur = ""
        if tok[0] in "+-":
            occur, tok = tok[0], tok[1:]
        if negate_next:
            if occur:
                raise QueryStringError("NOT followed by +/- prefixed term")
            occur = "-"
            negate_next = False
        if not tok:
            raise QueryStringError("dangling +/- with no term")
        if ":" in tok:
            raise QueryStringError(
                f"field-qualified term {tok!r} not supported: this is the "
                "single-field engine (use the edismax qf surface in "
                "plans/multifield.py for multi-field routing)"
            )
        boost = None
        m = _BOOST_RE.match(tok)
        if m:
            tok, boost = m.group(1), float(m.group(2))
        if tok.startswith("*") or tok.startswith("?") or "?" in tok:
            raise QueryStringError(
                f"leading-wildcard / '?' term {tok!r} not supported"
            )
        if tok.endswith("*"):
            stem = tok[:-1]
            if not stem or "*" in stem:
                raise QueryStringError(f"bad wildcard term {tok!r}")
            if occur or boost is not None:
                raise QueryStringError(
                    "wildcard clauses are constant-score: +/-/^ "
                    f"modifiers on {tok!r} not supported"
                )
            pq.wildcards.append(stem.lower())
            continue
        m = _FUZZY_RE.match(tok)
        if m and tok.endswith(("~", "~0", "~1", "~2")):
            stem = m.group(1)
            if not stem or any(c in stem for c in "^~*"):
                raise QueryStringError(f"bad fuzzy term {tok!r}")
            edits = int(m.group(2)) if m.group(2) else 2
            if occur or boost is not None:
                raise QueryStringError(
                    f"+/-/^ modifiers on fuzzy term {tok!r} not supported"
                )
            pq.fuzzy.append((stem.lower(), edits))
            continue
        if "~" in tok or "*" in tok:
            raise QueryStringError(f"unsupported modifier in {tok!r}")
        if occur == "-":
            if boost is not None:
                raise QueryStringError(
                    "MUST_NOT clauses never score: boost on a prohibited "
                    f"term {tok!r} is meaningless"
                )
            pq.exclude_terms.append(tok)
            continue
        if occur == "+":
            pq.require_terms.append(tok)
        else:
            pq.should_terms.append(tok)
        if boost is not None:
            pq.term_boosts[tok] = boost
    if negate_next:
        raise QueryStringError("trailing NOT with no term")

    if saw_and and saw_or:
        raise QueryStringError(
            "mixed AND/OR without parens is ill-defined in the flat "
            "BooleanQuery grammar; use a uniform operator"
        )
    if saw_and:
        pq.min_match = "100%"
    scored = bool(pq.should_terms or pq.require_terms or pq.fuzzy)
    constant = bool(pq.wildcards or pq.term_range is not None)
    if not scored and not constant:
        raise QueryStringError("query has no positive clause")
    if pq.fuzzy and (pq.should_terms or pq.require_terms or constant
                     or pq.exclude_terms or pq.phrase is not None):
        raise QueryStringError(
            "fuzzy clauses combine only with themselves; mixed "
            "fuzzy+scored queries are not supported"
        )
    if len(pq.fuzzy) > 1:
        raise QueryStringError("at most one fuzzy clause per query")
    return pq
