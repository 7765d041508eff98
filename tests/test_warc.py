"""WARC container source/sink: codec round-trips, permissive resync, and
the distributed read/write paths over the synthetic Common-Crawl corpus.

The load-bearing check is the last one: corpus -> WARC files on disk ->
binaryFile scan -> read_warc -> html byte-identical per url, i.e. the
north rule's byte-identical-extraction invariant survives the raw-crawl
container round trip.
"""
from __future__ import annotations

import gzip
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from marc_solr_profiling_spark.corpus import generate_web_pages
from marc_solr_profiling_spark.sources.warc import (
    encode_warc_record,
    gzip_member,
    page_to_warc_response,
    parse_warc,
    pages_to_warc_records,
    read_warc,
    split_http_response,
    warc_pages,
    warcinfo_record,
    write_warc_files,
)

TS = datetime(2023, 5, 4, 12, 30, 0, tzinfo=timezone.utc)


def test_record_roundtrip_plain():
    rec = page_to_warc_response("https://a.example/x", TS, b"<html>hi</html>")
    [(headers, block, err)] = parse_warc(rec)
    assert err is None
    assert headers["WARC-Type"] == "response"
    assert headers["WARC-Target-URI"] == "https://a.example/x"
    assert headers["WARC-Date"] == "2023-05-04T12:30:00Z"
    status, ctype, body = split_http_response(block)
    assert (status, body) == (200, b"<html>hi</html>")
    assert ctype.startswith("text/html")


def test_body_containing_crlfcrlf_is_untouched():
    html = b"<pre>a\r\n\r\nb</pre>\r\n\r\n<p>tail</p>"
    rec = page_to_warc_response("https://a.example/y", TS, html)
    [(_, block, err)] = parse_warc(rec)
    assert err is None
    assert split_http_response(block)[2] == html


def test_multi_member_gzip_concatenation():
    recs = [
        gzip_member(warcinfo_record("f.warc.gz")),
        gzip_member(page_to_warc_response("https://a/1", TS, b"one")),
        gzip_member(page_to_warc_response("https://a/2", TS, b"two")),
    ]
    parsed = parse_warc(b"".join(recs))
    assert [h["WARC-Type"] for h, _, _ in parsed] == [
        "warcinfo", "response", "response"]
    assert all(e is None for _, _, e in parsed)
    bodies = [split_http_response(b)[2] for h, b, _ in parsed
              if h["WARC-Type"] == "response"]
    assert bodies == [b"one", b"two"]


def test_whole_file_gzip_also_accepted():
    plain = page_to_warc_response("https://a/1", TS, b"one") + \
        page_to_warc_response("https://a/2", TS, b"two")
    parsed = parse_warc(gzip.compress(plain))
    assert len(parsed) == 2 and all(e is None for _, _, e in parsed)


def test_resync_after_corrupt_record():
    good1 = page_to_warc_response("https://a/1", TS, b"one")
    bad = encode_warc_record(
        "response", {"WARC-Target-URI": "https://a/bad"}, b"xxx"
    ).replace(b"Content-Length: 3", b"Content-Length: zz")
    good2 = page_to_warc_response("https://a/2", TS, b"two")
    parsed = parse_warc(good1 + bad + good2)
    assert len(parsed) == 3
    errs = [e for _, _, e in parsed]
    assert errs[0] is None and errs[2] is None
    assert errs[1] == "bad Content-Length"
    assert split_http_response(parsed[2][1])[2] == b"two"


def test_truncated_final_record_flagged():
    good = page_to_warc_response("https://a/1", TS, b"one")
    cut = page_to_warc_response("https://a/2", TS, b"two" * 50)[:-40]
    parsed = parse_warc(good + cut)
    assert parsed[0][2] is None
    assert parsed[1][2] == "truncated block"


@pytest.fixture(scope="module")
def warc_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("warc") / "crawl")
    pages = generate_web_pages(spark, 200, partitions=4)
    write_warc_files(pages, out)
    return out


def test_write_read_html_byte_identical(spark, warc_dir):
    src = generate_web_pages(spark, 200, partitions=4).select(
        "url", "warc_ts", "html", "text")
    records = read_warc(spark.read.format("binaryFile").load(warc_dir))
    got = warc_pages(records)
    assert got.count() == 200

    joined = got.alias("g").join(src.alias("s"), "url").select(
        F.col("url"),
        (F.col("g.html") == F.col("s.html")).alias("same_html"),
        (F.col("g.warc_ts") == F.col("s.warc_ts")).alias("same_ts"),
    )
    n = joined.count()
    assert n == 200
    assert joined.filter("same_html AND same_ts").count() == n


def test_warcinfo_records_present(spark, warc_dir):
    records = read_warc(spark.read.format("binaryFile").load(warc_dir))
    counts = dict(records.groupBy("warc_type").count().collect())
    assert counts.get("warcinfo") == 4  # one per written partition
    assert counts.get("response") == 200


def test_extraction_invariant_through_warc(spark, warc_dir):
    """North-rule invariant through the container: extract(html from WARC)
    == the corpus's known text, byte-identical per url."""
    from marc_solr_profiling_spark.sources.html import extract_text_udf

    src = generate_web_pages(spark, 200, partitions=4).select("url", "text")
    got = warc_pages(
        read_warc(spark.read.format("binaryFile").load(warc_dir))
    ).withColumn("extracted", extract_text_udf()(F.col("html")))
    bad = (
        got.join(src, "url")
        .filter(F.col("extracted") != F.col("text"))
        .count()
    )
    assert bad == 0


def test_pages_to_warc_records_members_standalone(spark):
    pages = generate_web_pages(spark, 8, partitions=2)
    rows = pages_to_warc_records(pages).collect()
    assert len(rows) == 8
    for r in rows:
        [(h, block, err)] = parse_warc(bytes(r.warc_gz))
        assert err is None and h["WARC-Target-URI"] == r.url
