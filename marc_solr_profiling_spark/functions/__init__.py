"""Scalar/text function library (the analog of the reference's
``org.solrmarc.tools`` utility classes and the Solr analyzer chains)."""
