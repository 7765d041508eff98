"""The fused tokenize+count pass must be value-identical to the
Catalyst-visible logical plan (with_tokens -> term_freqs) — the build-path
optimization can never change a posting."""

from pyspark.sql import functions as F

from marc_solr_profiling_spark.corpus import generate_web_pages
from marc_solr_profiling_spark.operators.postings import (
    term_freqs, tokenize_and_count, with_tokens,
)


def _docs(spark, n=120):
    return (
        generate_web_pages(spark, n, seed=11, partitions=4)
        .withColumn("doc_id", F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long"))
        .select("doc_id", "text")
    )


def _norm(rows):
    return sorted((r["term"], r["doc_id"], r["tf"]) for r in rows)


def test_fused_matches_logical_plan(spark):
    docs = _docs(spark)
    for chain in ("text", "simple"):
        fused = tokenize_and_count(docs, key_col="doc_id", chain=chain)
        logical = term_freqs(
            with_tokens(docs, chain=chain), key_col="doc_id"
        )
        got = _norm(fused.filter("term IS NOT NULL").collect())
        want = _norm(logical.collect())
        assert got == want, chain


def test_fused_doc_len_and_sentinels(spark):
    docs = _docs(spark)
    fused = tokenize_and_count(docs, key_col="doc_id", chain="text")
    lens = {
        r["doc_id"]: r["doc_len"]
        for r in fused.select("doc_id", "doc_len").dropDuplicates(["doc_id"]).collect()
    }
    toks = with_tokens(docs, chain="text").select(
        "doc_id", F.size("tokens").alias("n")
    )
    want = {r["doc_id"]: r["n"] for r in toks.collect()}
    assert lens == want
    # the corpus edge docs include empty/whitespace-only texts -> sentinels
    empties = [k for k, v in want.items() if v == 0]
    assert empties
    sentinels = fused.filter("term IS NULL").select("doc_id").collect()
    assert sorted(r["doc_id"] for r in sentinels) == sorted(empties)


def test_fused_html_extraction_matches_text_column(spark):
    """html_col= fusion (extract inside the tokenize kernel) must produce
    byte-identical tf rows to extracting first and tokenizing the text
    column — the build-path worker fusion can never change a posting."""
    from marc_solr_profiling_spark.sources.html import extract_text_udf

    pages = generate_web_pages(spark, 80, seed=23, partitions=4).withColumn(
        "doc_id", F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
    )
    via_text = tokenize_and_count(
        pages.withColumn("etext", extract_text_udf()(F.col("html"))),
        key_col="doc_id", text_col="etext",
    )
    via_html = tokenize_and_count(pages, key_col="doc_id", html_col="html")
    a = {tuple(r) for r in via_text.collect()}
    b = {tuple(r) for r in via_html.collect()}
    assert a == b and len(a) > 0
