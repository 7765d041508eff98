"""Text analysis chains — the heart of the fulltext mapping.

Re-expresses the reference's three Solr analyzer chains
(``profiling/solr/conf/schema.xml:59-92``) as one pure-Python core shared by:
  * the index-time Spark pandas UDF,
  * the query-time tokenizer,
  * the pure-Python pytest oracle,
so index/query/oracle tokenization is byte-identical by construction
(north-rule invariant).

Chains:
  * ``text``       WhitespaceTokenizer -> ICUFolding (NFKC + casefold +
                   strip diacritics) -> WordDelimiter (splitOnCaseChange,
                   generate+catenate words/numbers, stemEnglishPossessive)
                   -> Porter stem -> RemoveDuplicates
                   (schema.xml:60-71)
  * ``textNoStem`` same chain minus stemming (schema.xml:74-83)
  * ``alphaSort``  whole value = one token: ICUFolding + trim
                   (schema.xml:86-92)
  * ``simple``     lower + split on non-alphanumeric — the SQL-replicable
                   chain used for the DuckDB-oracle-checked queries (both
                   Spark and DuckDB can express it natively, so the
                   correctness gate can value-hash it).

Performance note: analysis is Python-side by necessity, but always entered
through Arrow-batched pandas UDFs (`tokenize_udf`), never row-at-a-time
Spark UDFs. At 100 TB this stage is embarrassingly parallel (per-row), so
it scales linearly with executors; no shuffle is involved.
"""

from __future__ import annotations

import re
import unicodedata
from typing import Callable, Iterable, List

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .stemmer import porter_stem

# --------------------------------------------------------------------------
# pure-Python core (shared with the oracle)
# --------------------------------------------------------------------------

_WS_RE = re.compile(r"\s+")
# runs of letters or digits (post-folding); everything else is a delimiter
_ALNUM_RUN_RE = re.compile(r"[^\W_]+", re.UNICODE)
_CASE_OR_CLASS_SPLIT_RE = re.compile(
    r"(?<=[a-z])(?=[A-Z])|(?<=[A-Za-z])(?=\d)|(?<=\d)(?=[A-Za-z])"
)
_SIMPLE_TOKEN_RE = re.compile(r"[a-z0-9]+")


def icu_fold(s: str) -> str:
    """NFKC-normalize, strip combining marks (diacritics), casefold.

    The analog of ``ICUFoldingFilterFactory`` (schema.xml:62): unicode
    normalization + diacritic removal + case folding in one deterministic
    pass.
    """
    # NFKD first so combining marks become separable, drop them, then NFKC
    # to recompose compatibility forms deterministically.
    decomposed = unicodedata.normalize("NFKD", s)
    stripped = "".join(ch for ch in decomposed if not unicodedata.combining(ch))
    return unicodedata.normalize("NFKC", stripped).casefold()


def _word_delimit(token: str) -> List[str]:
    """WordDelimiterFilter semantics (schema.xml:64-67):
    stemEnglishPossessive, splitOnCaseChange + alpha<->num transitions,
    generateWordParts/NumberParts, catenateWords/Numbers.

    Operates on the *raw* (pre-folding) token because case-change splitting
    needs original case — mirroring Solr, where WordDelimiter runs on the
    token stream and folding is a separate stage. Here folding runs after
    delimiting so case information survives until the split.
    """
    # stemEnglishPossessive: strip trailing 's / ’s
    if token.endswith(("'s", "’s", "'S", "’S")):
        token = token[:-2]
    # split into alphanumeric runs (drops intra-word punctuation like hyphens)
    runs: List[str] = []
    for run in _ALNUM_RUN_RE.findall(token):
        runs.extend(p for p in _CASE_OR_CLASS_SPLIT_RE.split(run) if p)
    if not runs:
        return []
    out = list(runs)
    if len(runs) > 1:
        alpha = [r for r in runs if not r.isdigit()]
        digit = [r for r in runs if r.isdigit()]
        if len(alpha) > 1:
            out.append("".join(alpha))  # catenateWords
        if len(digit) > 1:
            out.append("".join(digit))  # catenateNumbers
    return out


# Memoization of the per-whitespace-token sub-chain. Web text is Zipfian, so
# a worker-local cache hits ~always after warmup; this turns the Python
# normalize/delimit/fold/stem pipeline into a dict lookup without changing a
# single output byte (the cache key is the raw whitespace token; the cached
# value is the final deduped token tuple). Bounded so adversarial corpora
# can't exhaust executor memory.
_TOKEN_CACHE_MAX = 1_000_000
_tok_cache: dict[bool, dict[str, tuple]] = {True: {}, False: {}}


def _analyze_ws_token(ws_tok: str, stem: bool) -> tuple:
    cache = _tok_cache[stem]
    hit = cache.get(ws_tok)
    if hit is not None:
        return hit
    # Pre-compose (NFKC) so combining marks don't split alnum runs; case
    # is preserved here — folding/casefold happens after delimiting.
    norm = unicodedata.normalize("NFKC", ws_tok)
    out: List[str] = []
    seen_here: set[str] = set()  # RemoveDuplicates within one position
    for part in _word_delimit(norm):
        folded = icu_fold(part)
        if not folded:
            continue
        final = porter_stem(folded) if stem else folded
        if final and final not in seen_here:
            seen_here.add(final)
            out.append(final)
    res = tuple(out)
    if len(cache) < _TOKEN_CACHE_MAX:
        cache[ws_tok] = res
    return res


def analyze_text(s: str | None, stem: bool = True) -> List[str]:
    """The full ``text`` chain: one string -> ordered token list."""
    if not s:
        return []
    tokens: List[str] = []
    for ws_tok in _WS_RE.split(s):
        if ws_tok:
            tokens.extend(_analyze_ws_token(ws_tok, stem))
    return tokens


def analyze_text_nostem(s: str | None) -> List[str]:
    """The ``textNoStem`` chain (schema.xml:74-83)."""
    return analyze_text(s, stem=False)


def alpha_sort_key(s: str | None) -> str:
    """``alphaSort`` chain: whole value -> one folded, trimmed token
    (schema.xml:86-92). Used for sort-key columns."""
    if s is None:
        return ""
    return icu_fold(s).strip()


def analyze_simple(s: str | None) -> List[str]:
    """SQL-replicable chain: lower + ``[a-z0-9]+`` runs.

    DuckDB equivalent (used verbatim in oracle_sql):
    ``regexp_extract_all(lower(text), '[a-z0-9]+')``.
    """
    if not s:
        return []
    return _SIMPLE_TOKEN_RE.findall(s.lower())


ANALYZERS: dict[str, Callable[[str | None], List[str]]] = {
    "text": analyze_text,
    "textNoStem": analyze_text_nostem,
    "simple": analyze_simple,
}


def analyze_field_debug(
    s: str | None, chain: str = "text",
) -> List[tuple]:
    """FieldAnalysisRequestHandler analog (``/analysis/field``,
    ``profiling/solr/conf/solrconfig.xml:527``): the per-stage token
    breakdown Solr's analysis screen shows for one field value —
    ordered ``(stage_name, tokens)`` pairs, one per filter of the
    chain. The final stage's tokens are IDENTICAL to
    ``ANALYZERS[chain](s)`` by construction (asserted in tests): this
    is a debugging view of the production chain, not a re-statement
    of it.

    Driver-side utility (the Solr handler is a debug endpoint, not a
    query path) — no Spark involvement needed.
    """
    if chain == "simple":
        return [("lowercase_alnum_runs", analyze_simple(s))]
    if chain not in ("text", "textNoStem"):
        raise ValueError(f"unknown chain {chain!r}")
    stem = chain == "text"
    ws = [t for t in _WS_RE.split(s)] if s else []
    ws = [t for t in ws if t]
    stages: List[tuple] = [("whitespace_tokenizer", list(ws))]
    norm = [unicodedata.normalize("NFKC", t) for t in ws]
    stages.append(("nfkc_normalize", list(norm)))
    delim = [list(_word_delimit(t)) for t in norm]
    stages.append(
        ("word_delimiter", [p for parts in delim for p in parts]))
    folded = [[f for f in (icu_fold(p) for p in parts) if f]
              for parts in delim]
    stages.append(
        ("icu_folding", [p for parts in folded for p in parts]))
    if stem:
        final_parts = [[porter_stem(p) for p in parts] for parts in folded]
        stages.append(
            ("porter_stem", [p for parts in final_parts for p in parts]))
    else:
        final_parts = folded
    deduped: List[str] = []
    for parts in final_parts:  # RemoveDuplicates is per source position
        seen: set = set()
        for p in parts:
            if p and p not in seen:
                seen.add(p)
                deduped.append(p)
    stages.append(("remove_duplicates", deduped))
    return stages


# --------------------------------------------------------------------------
# Stopword + synonym filter chains (test/solr/conf/schema.xml:171-207:
# text_general / text_en field types). The index chain applies the stop
# filter only; the query chain additionally expands synonyms — the one
# index/query asymmetry in the reference's analyzer definitions.
# --------------------------------------------------------------------------


def parse_synonyms(lines: Iterable[str]) -> dict:
    """Parse Solr ``synonyms.txt`` lines into token -> expansion tuple.

    Two forms (SynonymFilterFactory, expand=true):
      * ``a, b, c``  — every member maps to the whole group;
      * ``a => b, c`` — the left side maps to the right side only (the
        left token itself is replaced).
    Comments (#) and blanks ignored; matching is on the already-analyzed
    lowercase token.
    """
    table: dict[str, tuple] = {}
    for line in lines:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        if "=>" in line:
            lhs, rhs = line.split("=>", 1)
            targets = tuple(t.strip().lower() for t in rhs.split(",") if t.strip())
            for src in lhs.split(","):
                src = src.strip().lower()
                if src:
                    table[src] = targets
        else:
            group = tuple(t.strip().lower() for t in line.split(",") if t.strip())
            for src in group:
                table[src] = group
    return table


def stop_filter_pos(
    tokens: List[str], stopwords: frozenset
) -> List[tuple]:
    """StopFilter with enablePositionIncrements=true: drop stopword
    tokens but keep the position gaps they leave, so downstream phrase
    matching sees ``"war of the worlds"`` as war@0 worlds@3."""
    return [(t, i) for i, t in enumerate(tokens) if t not in stopwords]


class SolrTextChain:
    """A configurable stop/synonym chain over one of the base analyzers.

    Mirrors the reference's ``text_general`` (stop before synonyms on the
    query side) and ``text_en`` (synonyms before stop) orderings via
    ``synonyms_before_stop``. Synonyms apply to the QUERY chain only, as
    in the schema; the index chain is tokenizer + stop filter.
    """

    def __init__(
        self,
        base: str = "simple",
        stopwords: Iterable[str] = (),
        synonyms: dict | Iterable[str] | None = None,
        synonyms_before_stop: bool = False,
    ):
        self.base_name = base
        self.base = ANALYZERS[base]
        self.stopwords = frozenset(w.lower() for w in stopwords)
        if synonyms is None:
            self.synonyms: dict = {}
        elif isinstance(synonyms, dict):
            self.synonyms = synonyms
        else:
            self.synonyms = parse_synonyms(synonyms)
        self.synonyms_before_stop = synonyms_before_stop

    # -- index side --------------------------------------------------------

    def index_tokens(self, s: str | None) -> List[str]:
        return [t for t in self.base(s) if t not in self.stopwords]

    def index_tokens_pos(self, s: str | None) -> List[tuple]:
        return stop_filter_pos(self.base(s), self.stopwords)

    # -- query side --------------------------------------------------------

    def query_groups(self, s: str | None) -> List[List[str]]:
        """Analyzed query as one OR-group per surviving position: a token
        with synonyms becomes the ordered member list (Lucene
        SynonymQuery shape), others a singleton."""
        tokens = self.base(s)
        if self.synonyms_before_stop:
            expanded = [list(self.synonyms.get(t, (t,))) for t in tokens]
            return [
                grp
                for grp in expanded
                if not all(m in self.stopwords for m in grp)
            ]
        return [
            list(self.synonyms.get(t, (t,)))
            for t in tokens
            if t not in self.stopwords
        ]


def stop_filter_expr(tokens_col, stopwords: Iterable[str]):
    """JVM-side stop filter over an array<string> tokens column — the
    index-chain stop stage stays in whole-stage codegen."""
    stop_list = sorted({w.lower() for w in stopwords})
    return F.filter(tokens_col, lambda t: ~t.isin(stop_list))

# --------------------------------------------------------------------------
# Spark surface: Arrow-batched pandas UDFs + native-expression variants
# --------------------------------------------------------------------------


def tokenize_udf(chain: str = "text"):
    """pandas UDF ``string -> array<string>`` for the given chain.

    Arrow-batched (no per-row Python UDF). The inner loop is Python but runs
    over a whole Arrow batch at a time; this is the standard Spark shape for
    tokenization (no JVM-side stemmer is available to a PySpark-only repo).
    """
    analyze = ANALYZERS[chain]

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _tok(col: pd.Series) -> pd.Series:
        return col.map(analyze)

    return _tok


def alpha_sort_udf():
    """pandas UDF for the alphaSort chain (sort keys)."""

    @F.pandas_udf(T.StringType())
    def _key(col: pd.Series) -> pd.Series:
        return col.map(alpha_sort_key)

    return _key


def simple_tokens_expr(col):
    """Native-expression (JVM-side, codegen'd) version of the ``simple``
    chain — identical output to :func:`analyze_simple`, zero Python cost.
    Used in all oracle-checked queries so the hot path stays inside
    whole-stage codegen.
    """
    # regexp_extract_all keeps exactly the [a-z0-9]+ runs, like DuckDB's.
    return F.expr(
        f"filter(regexp_extract_all(lower({col}), '[a-z0-9]+', 0), x -> x != '')"
    )


def tokenize_queries(queries: Iterable[str], chain: str = "text") -> List[List[str]]:
    """Driver-side helper: tokenize a batch of query strings with the SAME
    chain as the index (the index/query symmetry the reference gets from
    sharing schema.xml)."""
    analyze = ANALYZERS[chain]
    return [analyze(q) for q in queries]
