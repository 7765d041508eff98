"""Inverted-index construction: tokens -> term frequencies -> doc/collection
statistics -> (physical layer in varbyte.py / segments.py).

The logical build mirrors what Lucene derives implicitly inside Solr when the
reference posts a document (``SolrProxy.addDoc`` ->
Lucene analysis+segment write, ``core/src/org/solrmarc/solr/
SolrServerProxy.java:31-50``; analysis chain ``profiling/solr/conf/
schema.xml:60-71``): per-doc term frequencies, document lengths, collection
stats (N, avgdl), document frequencies.

Scale notes (100 TB design point):
- tokenization is per-row, shuffle-free; Arrow-batched pandas UDF for the
  full chain, pure JVM regexp for the ``simple`` chain.
- term_freqs aggregates (term, doc) pairs: Spark's partial (map-side)
  aggregation collapses within-doc duplicates BEFORE the shuffle, so shuffle
  volume is bounded by distinct (term,doc) pairs, not token count. We emit
  (term, doc, tf) by exploding per-doc counted maps instead of exploding raw
  tokens — the per-doc count happens inside the row (no shuffle at all for
  the tf step), which is the map-side-combine the reference gets for free
  from Lucene's per-doc inverter.
- doc stats never shuffle (per-row size()).
- document frequency / collection frequency is one groupBy(term); hot terms
  (stopwords, Zipf head) are exact-count aggregations that AQE handles, but
  the *posting-list materialization* for hot terms is the real skew problem —
  handled by salted sub-blocks in segments.py, not here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.analyzer import simple_tokens_expr, tokenize_udf

DEFAULT_CHAIN = "text"


def with_tokens(docs: DataFrame, text_col: str = "text",
                chain: str = DEFAULT_CHAIN, out_col: str = "tokens") -> DataFrame:
    """Add an ``array<string>`` tokens column using the given analyzer chain.

    ``simple`` stays entirely JVM-side (whole-stage codegen); the full
    ``text``/``textNoStem`` chains go through the Arrow-batched pandas UDF.
    """
    if chain == "simple":
        return docs.withColumn(out_col, simple_tokens_expr(text_col))
    return docs.withColumn(out_col, tokenize_udf(chain)(F.col(text_col)))


def term_freqs(docs_with_tokens: DataFrame, key_col: str = "url",
               tokens_col: str = "tokens") -> DataFrame:
    """(term, <key>, tf) — one row per distinct term per doc.

    explode + groupBy(key, term): Spark's partial (map-side) hash
    aggregation collapses a document's repeated tokens BEFORE the shuffle —
    all tokens of one doc live in one input partition, so the shuffled
    volume is exactly the distinct (term, doc) pairs, the same as Lucene's
    per-doc inverter emits. The explode itself is pipelined inside
    whole-stage codegen (no materialization of the token rows).
    """
    return (
        docs_with_tokens
        .select(key_col, F.explode(tokens_col).alias("term"))
        .groupBy("term", key_col)
        .agg(F.count("*").cast("int").alias("tf"))
    )


def doc_stats(docs_with_tokens: DataFrame, key_col: str = "url",
              tokens_col: str = "tokens") -> DataFrame:
    """(key, doc_len). Includes zero-length docs (empty text) — they count
    toward N and avgdl exactly as in the oracle."""
    return docs_with_tokens.select(
        F.col(key_col),
        F.size(F.coalesce(F.col(tokens_col), F.array())).alias("doc_len"),
    )


def collection_stats(doc_stats_df: DataFrame) -> DataFrame:
    """Single-row (n_docs, avgdl, total_tokens)."""
    return doc_stats_df.agg(
        F.count("*").alias("n_docs"),
        F.avg("doc_len").alias("avgdl"),
        F.sum("doc_len").alias("total_tokens"),
    )


def document_freqs(tf_df: DataFrame) -> DataFrame:
    """(term, df, cf): document frequency + collection frequency per term.
    One shuffle on term; partial aggregation bounds the transfer."""
    return tf_df.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("cf"),
    )


def build_logical_index(docs: DataFrame, key_col: str = "url",
                        text_col: str = "text", chain: str = DEFAULT_CHAIN):
    """Convenience: returns (tf, doc_stats, collection_stats, df) DataFrames.

    The tokens column is computed once and reused by tf and doc_stats
    (Catalyst CSE-style manual sharing, the analog of the reference's
    perRecordInit shared intermediates, ``SolrIndexer.java:714-733``).
    """
    toks = with_tokens(docs, text_col=text_col, chain=chain)
    tf = term_freqs(toks, key_col=key_col)
    ds = doc_stats(toks, key_col=key_col)
    return tf, ds, collection_stats(ds), document_freqs(tf)
