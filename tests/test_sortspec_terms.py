"""Solr sort-spec grammar (functions/sort_spec.py) and the full
TermsComponent parameter surface (operators/facets.py:terms_component)."""

from __future__ import annotations

import pytest

from marc_solr_profiling_spark.functions.sort_spec import (
    apply_sort, parse_sort_spec,
)
from marc_solr_profiling_spark.operators.facets import terms_component


def test_parse_sort_spec():
    assert parse_sort_spec(
        "score desc, pub_date_sort desc, title_sort asc"
    ) == [("score", False), ("pub_date_sort", False), ("title_sort", True)]
    with pytest.raises(ValueError):
        parse_sort_spec("score")  # missing direction, like Solr
    with pytest.raises(ValueError):
        parse_sort_spec("score upward")
    with pytest.raises(ValueError):
        parse_sort_spec("  ,  ")


def test_apply_sort_nulls_last_both_directions(spark):
    rows = [(1, None, 5), (2, "b", 1), (3, "a", 9), (4, None, 7)]
    df = spark.createDataFrame(rows, ["i", "k", "v"])
    desc = [r["i"] for r in apply_sort(df, "k desc, i asc").collect()]
    assert desc == [2, 3, 1, 4]  # nulls last even under desc
    asc = [r["i"] for r in apply_sort(df, "k asc, i asc").collect()]
    assert asc == [3, 2, 1, 4]


def test_terms_component_params(spark):
    rows = []
    # 'spark' in docs 0,1,2; 'stream' in 0,1; 'scan' in 0; 'table' in 0,1
    for d, terms in enumerate(
        [["spark", "stream", "scan", "table", "spark"],
         ["spark", "stream", "table"],
         ["spark"]]
    ):
        rows += [(d, t) for t in terms]
    tf = spark.createDataFrame(rows, ["doc_id", "term"])
    out = terms_component(
        tf, prefix="s", mincount=2, sort="count", limit=10
    ).collect()
    # df counts are DOC freqs: within-doc repeat of 'spark' in doc 0
    # counts once
    assert [(r["term"], r["df"]) for r in out] == [
        ("spark", 3), ("stream", 2)
    ]
    idx = terms_component(tf, prefix="s", sort="index", limit=10).collect()
    assert [r["term"] for r in idx] == ["scan", "spark", "stream"]
    rng = terms_component(
        tf, lower="spark", lower_incl=False, upper="table",
        upper_incl=True, sort="index", limit=10,
    ).collect()
    assert [r["term"] for r in rng] == ["stream", "table"]
    mx = terms_component(tf, maxcount=2, sort="index", limit=10).collect()
    assert [r["term"] for r in mx] == ["scan", "stream", "table"]
    rx = terms_component(tf, regex="s.*m$", sort="index", limit=10).collect()
    assert [r["term"] for r in rx] == ["stream"]
