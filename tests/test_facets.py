"""Facet operators (operators/facets.py) — the reference's profiling
aggregation (solrconfig.xml:307-511: many facet.field per request,
facet.limit=21, facet.mincount=1).
"""

import pyspark.sql.functions as F
import pytest

from marc_solr_profiling_spark.operators.facets import (
    facet_counts,
    facet_multi,
)


@pytest.fixture(scope="module")
def tbl(spark):
    rows = [
        ("a", "x", None),
        ("a", "y", "p"),
        ("a", None, "p"),
        ("b", "y", "q"),
        ("b", "y", "q"),
        ("c", "z", "q"),
    ]
    return spark.createDataFrame(rows, "f1 string, f2 string, f3 string")


def test_facet_counts_order_and_mincount(tbl):
    got = [tuple(r) for r in facet_counts(tbl, "f1", limit=21).collect()]
    assert got == [("a", 3), ("b", 2), ("c", 1)]
    # mincount drops the tail; limit caps after ordering
    assert [tuple(r) for r in facet_counts(tbl, "f1", mincount=2).collect()] \
        == [("a", 3), ("b", 2)]
    assert [tuple(r) for r in facet_counts(tbl, "f1", limit=1).collect()] \
        == [("a", 3)]


def test_facet_counts_ignores_nulls_and_explodes_arrays(tbl, spark):
    assert [tuple(r) for r in facet_counts(tbl, "f2").collect()] \
        == [("y", 3), ("x", 1), ("z", 1)]
    arr = spark.createDataFrame(
        [(["m", "n"],), (["m"],), (None,)], "tags array<string>"
    )
    assert [tuple(r) for r in facet_counts(arr, "tags").collect()] \
        == [("m", 2), ("n", 1)]


def test_facet_multi_matches_per_field_facets(tbl):
    """One stack()-unpivot pass must equal K independent facet_counts
    scans (same ordering contract: count desc, value asc)."""
    multi = facet_multi(tbl, ["f1", "f2", "f3"], limit=21).collect()
    for field in ["f1", "f2", "f3"]:
        single = [tuple(r) for r in facet_counts(tbl, field).collect()]
        got = [
            (r["facet_value"], r["count"])
            for r in multi if r["facet_field"] == field
        ]
        assert got == single, field
    # rank is 1-based and dense per field
    ranks = [r["rank"] for r in multi if r["facet_field"] == "f1"]
    assert ranks == [1, 2, 3]


def test_facet_multi_limit_caps_per_field(spark):
    wide = spark.range(100).select(
        F.col("id").cast("string").alias("hi"),
        (F.col("id") % 2).cast("string").alias("lo"),
    )
    out = facet_multi(wide, ["hi", "lo"], limit=5).collect()
    by_field = {}
    for r in out:
        by_field.setdefault(r["facet_field"], []).append(r)
    assert len(by_field["hi"]) == 5   # capped
    assert len(by_field["lo"]) == 2   # fewer values than the limit


def test_stats_component_faceted_and_global(spark):
    from marc_solr_profiling_spark.operators.facets import stats_component

    df = spark.createDataFrame(
        [("A", 1.0), ("A", 3.0), ("B", 10.0), ("B", None)],
        "grp string, v double")
    got = {r["grp"]: r.asDict() for r in
           stats_component(df, "v", facet_field="grp").collect()}
    a = got["A"]
    assert (a["min"], a["max"], a["count"], a["missing"], a["sum"],
            a["mean"]) == (1.0, 3.0, 2, 0, 4.0, 2.0)
    assert a["stddev"] == pytest.approx(2 ** 0.5, abs=1e-4)
    b = got["B"]
    assert b["count"] == 1 and b["missing"] == 1
    assert b["stddev"] is None  # single sample: stddev_samp undefined
    g = stats_component(df, "v").collect()[0]
    assert g["count"] == 3 and g["missing"] == 1 and g["sum"] == 14.0


def test_more_like_this_finds_the_near_copy(spark):
    from marc_solr_profiling_spark.operators.bm25 import more_like_this

    docs = spark.createDataFrame(
        [(0, "apple banana cherry durian elderberry fig"),
         (1, "apple banana cherry durian elderberry plum"),
         (2, "apple banana grape kiwi lemon mango"),
         (3, "completely unrelated words about spark shuffles")],
        "doc_id long, text string")
    out = more_like_this(docs, 0, min_doc_freq=2, max_query_terms=5,
                         k=3).collect()
    ids = [r["doc_id"] for r in out]
    assert 0 not in ids            # source excluded
    assert ids[0] == 1             # near-copy ranks first
    assert 3 not in ids            # no shared interesting terms


def test_range_facet_buckets(spark):
    from marc_solr_profiling_spark.operators.facets import range_facet

    df = spark.createDataFrame(
        [(0.0,), (49.9,), (50.0,), (149.9,), (200.0,), (-1.0,), (None,)],
        "v double")
    got = {r["bucket_start"]: r["count"]
           for r in range_facet(df, "v", 0.0, 200.0, 50.0).collect()}
    # -1 (below start), 200 (>= end) and NULL fall out; [100,150) holds 149.9
    assert got == {0.0: 2, 50.0: 1, 100.0: 1}


def test_pivot_facet_nesting_totals(spark):
    from marc_solr_profiling_spark.operators.facets import pivot_facet

    df = spark.createDataFrame(
        [("A", "x"), ("A", "x"), ("A", "y"), ("B", "x"), ("B", None)],
        "o string, i string")
    rows = pivot_facet(df, "o", "i", limit=10).collect()
    # outer A (3 pairs) sorts before B (1 pair: the NULL inner is dropped)
    assert [tuple(r) for r in rows] == [
        ("A", 3, "x", 2), ("A", 3, "y", 1), ("B", 1, "x", 1)]
