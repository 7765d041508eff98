"""Solr SpellCheckComponent analog (DirectSolrSpellChecker).

The reference's Solr server exposes a ``/spell`` handler backed by
``solr.DirectSolrSpellChecker`` over the main-index term dictionary
(``test/solr/conf/solrconfig-vanilla.xml:1244-1362``), configured with
``maxEdits=2``, ``minPrefix=1``, ``minQueryLength=4``, ``accuracy=0.5``
and ``spellcheck.count=5`` (``:969-977,1256-1268``). This module
re-expresses that surface Spark-first: the dictionary is the distinct
analyzed term set with document frequencies (one groupBy over the
term-frequency frame — the same frame every other query operator
shares), and candidate generation is pure Catalyst expressions.

Scale shape: the dictionary is term-level, orders of magnitude smaller
than the corpus (Heaps' law — ~millions of terms for 10^12 docs, not
10^12 rows), so a filtered scan of it is cheap. The ``minPrefix`` +
length-band predicates prune before the levenshtein evaluation exactly
like DirectSpellChecker's FST prefix/length gates prune term-dictionary
enumeration; both are plain comparisons that whole-stage codegen
evaluates before the (more expensive) edit-distance call. No shuffle is
introduced beyond the dictionary aggregation itself, and the result is
``count`` rows.

Similarity normalization: Lucene's LuceneLevenshteinDistance is a
transposition-aware variant; we document and pin the classic
normalized form ``1 - dist / max(len(query), len(candidate))`` (both
Spark and DuckDB ship classic levenshtein), thresholded at ``accuracy``
— same gate semantics, provable in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.analyzer import ANALYZERS


def spellcheck_suggest(
    docs: DataFrame,
    query_word: str,
    key_col: str = "doc_id",
    chain: str = "simple",
    max_edits: int = 2,
    min_prefix: int = 1,
    min_query_length: int = 4,
    accuracy: float = 0.5,
    count: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Top-``count`` spelling suggestions for one query term.

    Semantics (DirectSolrSpellChecker, reference config values as
    defaults): candidates come from the analyzed term dictionary, must
    share the first ``min_prefix`` characters with the query term, sit
    within ``max_edits`` levenshtein distance, and clear the
    ``accuracy`` threshold on normalized similarity. Ranking is
    similarity desc, then document frequency desc (Lucene's
    ``SuggestWord`` comparator), then term asc for determinism. A query
    term shorter than ``min_query_length`` gets no suggestions (the
    component declines to check it).

    Returns ``(term, distance, df, similarity)``.
    """
    from .postings import term_freqs, with_tokens

    analyzed = ANALYZERS[chain](query_word)
    q = analyzed[0] if analyzed else ""
    empty = (
        docs.sparkSession.createDataFrame(
            [], "term string, distance int, df long, similarity double")
    )
    if len(q) < min_query_length:
        return empty

    tf = term_freqs(with_tokens(docs, chain=chain), key_col=key_col)
    dictionary = tf.groupBy("term").agg(F.count("*").alias("df"))

    qlen = len(q)
    sim = (
        F.lit(1.0)
        - F.col("distance") / F.greatest(F.length("term"), F.lit(qlen))
    )
    cand = (
        dictionary
        .filter(F.col("term") != q)
        .filter(F.length("term").between(qlen - max_edits, qlen + max_edits))
        .filter(F.substring("term", 1, min_prefix) == q[:min_prefix])
        .withColumn(
            "distance", F.levenshtein(F.col("term"), F.lit(q)).cast("int"))
        .filter(F.col("distance") <= max_edits)
        .withColumn("similarity", F.round(sim, round_to))
        .filter(sim >= accuracy)
    )
    return (
        cand.orderBy(
            F.desc("similarity"), F.desc("df"), F.asc("term"))
        .limit(count)
        .select("term", "distance", F.col("df").cast("long").alias("df"),
                "similarity")
    )


def suggest_prefix(
    docs: DataFrame,
    prefix: str,
    key_col: str = "doc_id",
    chain: str = "simple",
    count: int = 5,
) -> DataFrame:
    """Solr Suggester analog (the SuggestComponent /suggest handler that
    ships in the same solrconfig family as /spell — suggest-as-you-type
    over the index term dictionary, FreeTextLookupFactory-style
    frequency weighting): top-``count`` dictionary terms starting with
    ``prefix``, ranked by weight desc then term asc.

    Weight = total term frequency across the collection (the "freq"
    weight a dictionary-based suggester derives from the index). The
    prefix predicate is a range scan on the sorted term dictionary in
    the physical index; here it is one filtered groupBy over the shared
    tf frame — term-level, never corpus-row-level, no new shuffle shape.

    Returns ``(term, weight)``.
    """
    from .postings import term_freqs, with_tokens

    tf = term_freqs(with_tokens(docs, chain=chain), key_col=key_col)
    return (
        tf.filter(F.col("term").startswith(prefix))
        .groupBy("term")
        .agg(F.sum("tf").cast("long").alias("weight"))
        .orderBy(F.desc("weight"), F.asc("term"))
        .limit(count)
    )


def _rank_spell_candidates(dictionary: DataFrame, q: str, max_edits: int,
                           min_prefix: int, accuracy: float, count: int,
                           round_to: int) -> DataFrame:
    """Shared DirectSolrSpellChecker candidate ranking over a (term, df)
    dictionary frame (logical tf-derived or the physical index's
    committed dictionary stage)."""
    qlen = len(q)
    sim = (
        F.lit(1.0)
        - F.col("distance") / F.greatest(F.length("term"), F.lit(qlen))
    )
    cand = (
        dictionary
        .filter(F.col("term") != q)
        .filter(F.length("term").between(qlen - max_edits, qlen + max_edits))
        .filter(F.substring("term", 1, min_prefix) == q[:min_prefix])
        .withColumn(
            "distance", F.levenshtein(F.col("term"), F.lit(q)).cast("int"))
        .filter(F.col("distance") <= max_edits)
        .withColumn("similarity", F.round(sim, round_to))
        .filter(sim >= accuracy)
    )
    return (
        cand.orderBy(
            F.desc("similarity"), F.desc("df"), F.asc("term"))
        .limit(count)
        .select("term", "distance", F.col("df").cast("long").alias("df"),
                "similarity")
    )


def spellcheck_suggest_phys(
    index,
    query_word: str,
    max_edits: int = 2,
    min_prefix: int = 1,
    min_query_length: int = 4,
    accuracy: float = 0.5,
    count: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """:func:`spellcheck_suggest` FROM THE PHYSICAL INDEX — the way
    DirectSolrSpellChecker actually works (it walks the index term
    dictionary directly, no corpus pass): candidates come from the
    committed ``dictionary`` stage's (term, df) rows; the min_prefix
    predicate is a range scan of the term-sorted parquet. df values are
    delete-adjusted on generation chains, so ranking matches a rebuild."""
    analyzed = ANALYZERS[index.chain](query_word)
    q = analyzed[0] if analyzed else ""
    if len(q) < min_query_length:
        return index.spark.createDataFrame(
            [], "term string, distance int, df long, similarity double")
    return _rank_spell_candidates(
        index.dictionary.select("term", "df"), q, max_edits, min_prefix,
        accuracy, count, round_to)


def suggest_prefix_phys(index, prefix: str, count: int = 5) -> DataFrame:
    """:func:`suggest_prefix` FROM THE PHYSICAL INDEX: weight is the
    collection frequency (cf) the dictionary stage already carries —
    the prefix predicate prunes the term-sorted parquet row groups; no
    corpus pass, no aggregation at query time."""
    return (
        index.dictionary
        .filter(F.col("term").startswith(prefix))
        .select("term", F.col("cf").cast("long").alias("weight"))
        .orderBy(F.desc("weight"), F.asc("term"))
        .limit(count)
    )
