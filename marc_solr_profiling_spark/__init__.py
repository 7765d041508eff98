"""marc_solr_profiling_spark — a PySpark-native inverted-index builder and BM25
top-k query engine.

From-scratch re-expression (NOT a port) of the capabilities of
``seanpm2001/marc-solr-profiling`` — a SolrMarc fork whose pipeline is:
read records -> extract/normalize fields -> analyze (tokenize/fold/stem) ->
write to a Solr 4.4 / Lucene inverted index -> query with relevance-ranked
top-k, facet counts, and term browsing (see ``SURVEY.md``).

Here the same semantics run Spark-first:

- corpus: table of Common-Crawl-style web pages
  ``(url, warc_ts, html:binary, text, lang)``
- extraction + analysis: vectorized pandas/Arrow UDFs sharing one
  pure-Python analyzer between index time, query time, and the test oracle
- index: posting lists built with groupBy/applyInPandas, delta+varbyte
  compressed docID gaps, per-block max-score metadata, skew-salted shuffles
- query: block-max WAND top-k inside mapPartitions, BM25 k1=1.2 b=0.75
- profiling surface: facet counts / terms browse / numFound (the reference's
  actual product, solrconfig.xml:64-280)
"""

__version__ = "0.1.0"
