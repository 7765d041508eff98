"""Web-corpus hygiene operators (functions/webclean.py): URL
canonicalization/dedup, PII redaction, C4 line filter, cross-corpus
duplicated-line removal. Semantics per RFC 3986 §6, Raffel et al. 2020
§2.2 (C4), Wenzek et al. 2020 §3.1 (CCNet)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from marc_solr_profiling_spark.functions.webclean import (
    c4_line_filter,
    canonicalize_url_expr,
    duplicate_line_stats,
    redact_pii,
    url_dedup,
)


CANON_CASES = [
    # scheme+host case, default https port, www strip
    ("HTTPS://WWW.Example.COM:443/a", "https://example.com/a"),
    # http default port; :443 NOT stripped for http
    ("http://example.com:80/a", "http://example.com/a"),
    ("http://example.com:443/a", "http://example.com:443/a"),
    # trailing slashes collapse; bare host -> '/'
    ("https://example.com/a///", "https://example.com/a"),
    ("https://example.com", "https://example.com/"),
    ("https://example.com/", "https://example.com/"),
    # fragment dropped
    ("https://example.com/a#sec-2", "https://example.com/a"),
    # tracking params dropped, remainder sorted, empties dropped
    ("https://example.com/a?utm_source=x&b=2&a=1",
     "https://example.com/a?a=1&b=2"),
    ("https://example.com/a?gclid=99&fbclid=7&ref=hn",
     "https://example.com/a"),
    ("https://example.com/a?&&b=1", "https://example.com/a?b=1"),
    # path case is PRESERVED (paths are case-sensitive, RFC 3986 §6.2.2.1)
    ("https://example.com/A/B", "https://example.com/A/B"),
    # non-URL strings pass through untouched
    ("not a url", "not a url"),
    ("", ""),
]


def test_canonicalize_url_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in CANON_CASES], "url string")
    got = [r[0] for r in
           df.select(canonicalize_url_expr("url")).collect()]
    assert got == [want for _, want in CANON_CASES]


def test_url_dedup_groups_and_winner(spark):
    df = spark.createDataFrame(
        [(1, "https://example.com/a?utm_source=x"),
         (2, "HTTPS://WWW.EXAMPLE.COM/a"),
         (3, "https://example.com/a/"),
         (4, "https://example.com/b")],
        "doc_id long, url string")
    out = {r["canonical_url"]: r for r in url_dedup(df).collect()}
    assert out["https://example.com/a"]["n_urls"] == 3
    assert out["https://example.com/a"]["n_raw_variants"] == 3
    assert out["https://example.com/a"]["kept_doc_id"] == 1
    assert out["https://example.com/b"]["n_urls"] == 1


def test_url_dedup_freshest_capture_wins(spark):
    # ts_col: LATEST timestamp wins; tie broken by LOWEST key
    df = spark.createDataFrame(
        [(1, "https://e.com/a", 10), (2, "https://e.com/a/", 30),
         (3, "https://e.com/a#f", 30), (4, "https://e.com/a", 20)],
        "doc_id long, url string, ts long")
    row = url_dedup(df, ts_col="ts").collect()[0]
    assert row["kept_doc_id"] == 2      # ts=30 tie between 2 and 3 -> min key
    assert row["n_urls"] == 4 and row["n_raw_variants"] == 3


def test_redact_pii_counts_and_order(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b12@x-y.co or c@d.org, host 10.20.30.40, "
             "call 555-123-4567 / 555.987.6543"),
         # digits+dots inside the email local part must NOT count as an IP
         # because the email pass runs (and redacts) first
         (2, "x.1.2.3.4@example.com only"),
         (3, "nothing here")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert (out[1]["n_email"], out[1]["n_ip"], out[1]["n_phone"]) == (2, 1, 2)
    assert "<EMAIL>" in out[1]["redacted"]
    assert "<IP>" in out[1]["redacted"]
    assert out[1]["redacted"].count("<PHONE>") == 2
    assert (out[2]["n_email"], out[2]["n_ip"]) == (1, 0)
    assert (out[3]["n_email"], out[3]["n_ip"], out[3]["n_phone"]) == (0, 0, 0)
    assert out[3]["redacted"] == "nothing here"


def test_c4_line_filter_rules(spark):
    doc = "\n".join([
        "This line is long enough and ends well.",   # kept
        "Short one.",                                 # < 3 words -> dropped
        "no terminal punctuation on this line",       # dropped
        "Enable Cookie tracking to proceed.",         # blacklist -> dropped
        "Another perfectly fine sentence here!",      # kept
        "   ",                                        # blank -> not a line
    ])
    df = spark.createDataFrame([(1, doc), (2, "one good line here.")],
                               "doc_id long, text string")
    out = {r["doc_id"]: r for r in c4_line_filter(df).collect()}
    assert out[1]["n_lines"] == 5 and out[1]["n_kept"] == 2
    assert out[1]["kept"] is True
    # doc 2: a single surviving line fails the >= 2 kept-lines doc gate
    assert out[2]["n_kept"] == 1 and out[2]["kept"] is False
    # clean_chars = rejoined surviving text
    kept_lines = ["This line is long enough and ends well.",
                  "Another perfectly fine sentence here!"]
    assert out[1]["clean_chars"] == len("\n".join(kept_lines))


def test_c4_line_filter_knobs(spark):
    df = spark.createDataFrame([(1, "a b.\nc d.")], "doc_id long, text string")
    strict = c4_line_filter(df, min_words=3).collect()[0]
    loose = c4_line_filter(df, min_words=2, min_kept_lines=2).collect()[0]
    assert strict["n_kept"] == 0 and strict["kept"] is False
    assert loose["n_kept"] == 2 and loose["kept"] is True


def test_duplicate_line_stats_min_docs(spark):
    df = spark.createDataFrame(
        [(1, "Cookie banner\nunique to one\nFooter 2020"),
         (2, "cookie banner\nother content\nfooter 2020"),
         (3, "COOKIE BANNER  \nthird thing")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in duplicate_line_stats(df).collect()}
    # 'cookie banner' normalized appears in 3 docs, 'footer 2020' in 2
    assert (out[1]["n_lines"], out[1]["n_dup"]) == (3, 2)
    assert (out[2]["n_lines"], out[2]["n_dup"]) == (3, 2)
    assert (out[3]["n_lines"], out[3]["n_dup"]) == (2, 1)
    assert out[3]["dup_frac"] == pytest.approx(0.5)
    # min_docs=3: only the 3-doc banner counts
    out3 = {r["doc_id"]: r["n_dup"]
            for r in duplicate_line_stats(df, min_docs=3).collect()}
    assert out3 == {1: 1, 2: 1, 3: 1}


def test_cleaning_funnel_stages(spark):
    """Hand-built fixture where each stage drops a known row: docs 1/2
    share a canonical URL (2 loses), doc 3 fails the quality gate (too
    short), docs 1/4 share text (4 loses exact dedup)."""
    from marc_solr_profiling_spark.functions.webclean import cleaning_funnel

    good = ("the quick brown fox jumps over a lazy dog near the "
            "riverbank today " * 2)
    docs = spark.createDataFrame(
        [
            (1, "https://a.example/x", good),
            (2, "HTTPS://A.EXAMPLE:443/x/", good + "tail variant here"),
            (3, "https://b.example/y", "too short"),
            (4, "https://c.example/z", good),
        ],
        "doc_id long, url string, text string",
    )
    out = {r.stage: r for r in cleaning_funnel(
        docs, stopwords=["the", "a"], min_tokens=5, max_tokens=1000,
        min_mean_word_len=1.0, max_mean_word_len=10.0,
        min_distinct_stopwords=1, max_punct_ratio=0.5,
        max_top2_frac=1.0, max_dup5_frac=1.0,
    ).collect()}
    assert (out["input"].n_in, out["input"].n_kept) == (4, 4)
    assert (out["url_dedup"].n_in, out["url_dedup"].n_kept) == (4, 3)
    assert (out["quality"].n_in, out["quality"].n_kept) == (3, 2)
    assert (out["exact_dedup"].n_in, out["exact_dedup"].n_kept) == (2, 1)
    assert out["exact_dedup"].n_dropped == 1


def test_cleaning_funnel_no_url_stage(spark):
    from marc_solr_profiling_spark.functions.webclean import cleaning_funnel

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over a lazy dog here")],
        "doc_id long, text string")
    stages = [r.stage for r in cleaning_funnel(
        docs, url_col=None, stopwords=["the", "a"], min_tokens=5,
        max_tokens=1000, min_mean_word_len=1.0, max_mean_word_len=10.0,
        min_distinct_stopwords=1, max_punct_ratio=0.5,
        max_top2_frac=1.0, max_dup5_frac=1.0,
    ).orderBy("stage_order").collect()]
    assert stages == ["input", "quality", "exact_dedup"]


def test_domain_stats_host_and_blocklist(spark):
    from marc_solr_profiling_spark.functions.webclean import domain_stats

    df = spark.createDataFrame(
        [
            (0, "https://WWW.Good.COM:443/a", "one two"),
            (1, "https://good.com/b", "three"),
            (2, "http://sub.evil.org:80/x", "a b c"),
            (3, "https://evil.org/y", "d"),
            (4, "https://evilish.org/z", "e f"),
        ],
        "doc_id long, url string, text string",
    )
    got = {r["host"]: (r["n_docs"], r["n_tokens"], r["blocked"])
           for r in domain_stats(df, text_col="text",
                                 blocklist=["evil.org"]).collect()}
    assert got["good.com"] == (2, 3, False)       # www/port/case collapsed
    assert got["sub.evil.org"] == (1, 3, True)    # subdomain blocked
    assert got["evil.org"] == (1, 1, True)
    assert got["evilish.org"] == (1, 2, False)    # suffix rule, not substring
