"""Reader/merge round-trip tier (SURVEY.md §5): combine-continuations,
MHLD holdings merge, delete-list application, natural-order sort —
mirroring RecordReaderTest / MergeSummaryHoldingsTests /
CombineMultBibsMhldsReaderTest scenarios."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from marc_solr_profiling_spark.operators.fieldspec import MARC_SCHEMA
from marc_solr_profiling_spark.operators.marc_merge import (
    apply_delete_list, combine_records, merge_summary_holdings,
    natural_sort_records,
)

SEQ_SCHEMA = T.StructType(
    [T.StructField("seq", T.IntegerType(), False)] + list(MARC_SCHEMA.fields)
)


def _df(spark, rows, schema=SEQ_SCHEMA):
    return spark.createDataFrame(rows, schema)


def _tags(row):
    return [f["tag"] for f in row["datafields"]]


def test_combine_records_appends_continuation_fields(spark):
    # u55_split.mrc scenario (maintest.txt: +marc.combine_records=999 ->
    # item fields from both parts survive)
    rows = [
        (0, "u55", "L1", [("001", "u55")],
         [("245", " ", " ", [("a", "T")]), ("999", " ", " ", [("m", "ALDERMAN")])]),
        (1, "u55", "L2", [("001", "u55")],
         [("245", " ", " ", [("a", "IGNORED")]), ("999", " ", " ", [("m", "CLEMONS")])]),
        (2, "u56", "L1", [("001", "u56")],
         [("999", " ", " ", [("m", "ONLY")])]),
    ]
    out = {r["record_id"]: r for r in combine_records(_df(spark, rows)).collect()}
    u55 = out["u55"]
    assert u55["leader"] == "L1"  # base = first by seq
    assert _tags(u55) == ["245", "999", "999"]
    vals = [f["subfields"][0]["value"] for f in u55["datafields"] if f["tag"] == "999"]
    assert vals == ["ALDERMAN", "CLEMONS"]
    assert _tags(out["u56"]) == ["999"]


def test_merge_summary_holdings(spark):
    bib_rows = [
        (0, "b1", "L", [("001", "b1")],
         [("245", " ", " ", [("a", "T")]),
          ("866", " ", " ", [("a", "stale bib holdings")]),
          ("999", " ", " ", [("m", "ITEM")])]),
        (0, "b2", "L", [("001", "b2")],
         [("245", " ", " ", [("a", "No holdings")])]),
    ]
    mhld_rows = [
        (0, "b1", "Lm", [("001", "b1")],
         [("852", " ", " ", [("b", "GREEN")]),
          ("866", "3", "1", [("a", "v.1-v.40")]),
          ("245", " ", " ", [("a", "mhld title — never merged")])]),
    ]
    bib = _df(spark, bib_rows)
    mhld = _df(spark, mhld_rows)
    out = {r["record_id"]: r for r in merge_summary_holdings(bib, mhld).collect()}
    # matched: mhld 852/866 replace the stale bib 866, inserted before 999
    assert _tags(out["b1"]) == ["245", "852", "866", "999"]
    v866 = [f["subfields"][0]["value"] for f in out["b1"]["datafields"]
            if f["tag"] == "866"]
    assert v866 == ["v.1-v.40"]
    # left-outer: unmatched bib unchanged
    assert _tags(out["b2"]) == ["245"]


def test_apply_delete_list(spark):
    recs = _df(spark, [
        (0, "u1", "L", [], []),
        (0, "u2", "L", [], []),
        (0, "u3", "L", [], []),
    ])
    dels = spark.createDataFrame([("u2",), ("u9",)], "record_id string")
    left = sorted(r["record_id"] for r in apply_delete_list(recs, dels).collect())
    assert left == ["u1", "u3"]


def test_natural_sort_records(spark):
    recs = _df(spark, [
        (0, "u100", "L", [], []),
        (0, "u99", "L", [], []),
        (0, "u9", "L", [], []),
    ])
    got = [r["record_id"] for r in natural_sort_records(recs).collect()]
    assert got == ["u9", "u99", "u100"]  # u99 < u100 (StringNaturalCompare)
