"""Packed per-doc postings (the build-path wire format) must be
value-identical to the exploded row form in every mode — text, fused
HTML extraction, and positional — and the packed segment builder must
produce the same physical blocks as the exploded one."""

from pyspark.sql import functions as F

from marc_solr_profiling_spark.corpus import generate_web_pages
from marc_solr_profiling_spark.operators.postings import (
    explode_packed_tf,
    tokenize_and_count,
    tokenize_and_count_packed,
)
from marc_solr_profiling_spark.operators.segments import (
    build_segments,
    build_segments_packed,
)


def _docs(spark, n=150):
    return (
        generate_web_pages(spark, n, seed=11, partitions=4)
        .withColumn(
            "doc_id", F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
        )
        .select("doc_id", "text", "html")
    )


def test_packed_equals_exploded_all_modes(spark):
    docs = _docs(spark)
    for kw in (
        {"text_col": "text"},
        {"html_col": "html"},
        {"text_col": "text", "positions": True},
    ):
        exploded = tokenize_and_count(
            docs, key_col="doc_id", chain="text", **kw
        ).filter("term IS NOT NULL")
        via_packed = explode_packed_tf(
            tokenize_and_count_packed(docs, key_col="doc_id", chain="text", **kw),
            "doc_id",
        ).select(*exploded.columns)
        assert exploded.exceptAll(via_packed).count() == 0, kw
        assert via_packed.exceptAll(exploded).count() == 0, kw


def test_packed_row_per_doc_including_empty(spark):
    docs = _docs(spark)
    packed = tokenize_and_count_packed(docs, key_col="doc_id", chain="text")
    assert packed.count() == docs.count()
    # doc_len == sum(tfs) per doc (empty docs: 0 == empty-array sum)
    bad = packed.filter(
        F.col("doc_len")
        != F.aggregate("tfs", F.lit(0), lambda acc, x: acc + x)
    ).count()
    assert bad == 0


def test_packed_segments_match_exploded_segments(spark):
    docs = _docs(spark)
    for positions in (False, True):
        packed = tokenize_and_count_packed(
            docs, key_col="doc_id", chain="text", positions=positions
        )
        seg_cols = ["term", "doc_id", "tf", "doc_len"] + (
            ["pos"] if positions else []
        )
        exploded = explode_packed_tf(packed, "doc_id").select(*seg_cols)
        a = build_segments(exploded, avgdl=120.0, n_salts=4, block_size=8)
        b = build_segments_packed(packed, avgdl=120.0, n_salts=4, block_size=8)
        assert a.exceptAll(b).count() == 0, positions
        assert b.exceptAll(a).count() == 0, positions


def test_packed_segments_range_buckets_disjoint(spark):
    """range_buckets > 1 must keep (term, salt) block doc-ranges disjoint
    (the block-max scorer's invariant) and preserve posting content."""
    docs = _docs(spark)
    packed = tokenize_and_count_packed(docs, key_col="doc_id", chain="text")
    segs = build_segments_packed(
        packed, avgdl=120.0, n_salts=2, block_size=8, range_buckets=3
    ).collect()
    by_group: dict = {}
    for r in segs:
        by_group.setdefault((r["term"], r["salt"]), []).append(
            (r["first_doc"], r["last_doc"])
        )
    for key, ranges in by_group.items():
        ranges.sort()
        for (f1, l1), (f2, l2) in zip(ranges, ranges[1:]):
            assert l1 < f2, (key, ranges)
    # same total postings as the unbucketed build
    base = build_segments_packed(
        packed, avgdl=120.0, n_salts=2, block_size=8
    ).agg(F.sum("n_postings")).collect()[0][0]
    assert sum(r["n_postings"] for r in segs) == base


def test_resolve_range_buckets_auto_bounds_kernel_memory(spark):
    """auto must satisfy BOTH terms: segment-stage parallelism >= cores
    AND docs-per-bucket <= spark.marc.docsPerRangeBucket (kernel peak
    memory is per-bucket — a 3.2M-doc build at n_salts=64 used to put 50k
    docs in every concurrent worker and OOM the host)."""
    from marc_solr_profiling_spark.plans.build import _resolve_range_buckets

    # tiny corpora: one bucket, no quantile job
    assert _resolve_range_buckets("auto", spark, 64, 20_000) == 1
    # protocol scale (320k, 64 salts): 5k docs/salt, under the cap
    p = spark.sparkContext.defaultParallelism
    assert _resolve_range_buckets("auto", spark, 64, 320_000) \
        == max(1, -(-p // 64))
    # sf1 scale (3.2M, 64 salts): 50k docs/salt -> ceil(50k/16384) = 4
    assert _resolve_range_buckets("auto", spark, 64, 3_200_000) >= 4
    # explicit override wins
    assert _resolve_range_buckets(7, spark, 64, 3_200_000) == 7
    # conf override of the cap
    spark.conf.set("spark.marc.docsPerRangeBucket", "1000")
    try:
        assert _resolve_range_buckets("auto", spark, 4, 100_000) == 25
    finally:
        spark.conf.unset("spark.marc.docsPerRangeBucket")
