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


def test_patch_locations(spark):
    """MarcPatcher semantics (MarcPatcher.java:375-460): item matched by
    barcode $i; $l set to home; $k present iff current != home."""
    from marc_solr_profiling_spark.operators.fieldspec import MARC_SCHEMA
    from marc_solr_profiling_spark.operators.marc_merge import (
        patch_locations,
    )

    rows = [
        ("r1", "ldr", [],
         [("999", " ", " ", [("a", "QA1"), ("i", "bc1"), ("l", "STACKS")]),
          ("999", " ", " ", [("a", "QA2"), ("i", "bc2"), ("l", "STACKS")])]),
        ("r2", "ldr", [],
         [("999", " ", " ", [("a", "QB3"), ("i", "bc3"), ("k", "INPROCESS"),
                             ("l", "STACKS")])]),
        ("r3", "ldr", [],
         [("999", " ", " ", [("a", "QC4"), ("i", "bc4"), ("l", "EAST")])]),
    ]
    records = spark.createDataFrame(rows, MARC_SCHEMA)
    locations = spark.createDataFrame(
        [("r1", "bc1", "CHECKEDOUT", "STACKS"),   # current != home -> add $k
         ("r2", "bc3", "STACKS", "STACKS")],      # back home -> drop $k
        "record_id string, barcode string, current_loc string, home_loc string",
    )
    out = {r["record_id"]: r for r in
           patch_locations(records, locations).collect()}

    f1 = out["r1"]["datafields"][0]["subfields"]
    assert [(s["code"], s["value"]) for s in f1] == [
        ("a", "QA1"), ("i", "bc1"), ("k", "CHECKEDOUT"), ("l", "STACKS")]
    # unmatched barcode in the same record untouched
    f2 = out["r1"]["datafields"][1]["subfields"]
    assert [(s["code"], s["value"]) for s in f2] == [
        ("a", "QA2"), ("i", "bc2"), ("l", "STACKS")]
    assert out["r1"]["changed"] is True
    # $k removed when item is back at home location
    f3 = out["r2"]["datafields"][0]["subfields"]
    assert [(s["code"], s["value"]) for s in f3] == [
        ("a", "QB3"), ("i", "bc3"), ("l", "STACKS")]
    assert out["r2"]["changed"] is True
    # record with no patch line: unchanged, flag False
    assert out["r3"]["changed"] is False
    assert [(s["code"], s["value"])
            for s in out["r3"]["datafields"][0]["subfields"]] == [
        ("a", "QC4"), ("i", "bc4"), ("l", "EAST")]


def test_booklist_enrich(spark):
    from marc_solr_profiling_spark.operators.marc_merge import (
        booklist_enrich,
    )

    docs = spark.createDataFrame(
        [("r1", "t1"), ("r2", "t2"), ("r3", "t3")],
        "record_id string, title string",
    )
    booklist = spark.createDataFrame(
        [("r1", "FUND-A"), ("r3", "FUND-B")],
        "record_id string, fund_code string",
    )
    out = {r["record_id"]: r for r in
           booklist_enrich(docs, booklist).collect()}
    assert out["r1"]["fund_code"] == "FUND-A" and out["r1"]["on_booklist"]
    assert out["r2"]["fund_code"] is None and not out["r2"]["on_booklist"]
    assert out["r3"]["fund_code"] == "FUND-B"


def test_combine_mult_bibs_mhlds_runs_and_errors(spark):
    """The bib+ mhld* run grouping of CombineMultBibsMhldsReader.java:11-61
    including the out-of-order error conditions."""
    from pyspark.sql import types as T

    from marc_solr_profiling_spark.operators.fieldspec import MARC_SCHEMA
    from marc_solr_profiling_spark.operators.marc_merge import (
        combine_mult_bibs_mhlds,
    )

    BIB = "01234cam a2200000 a 4500"
    MHLD = "01234cuas2200000 a 4500"  # leader byte 06 (0-based) = u -> MHLD

    def row(seq, rid, leader, data):
        return ("f.mrc", seq, rid, leader, [], data)

    schema = T.StructType(
        [T.StructField("path", T.StringType()),
         T.StructField("seq", T.IntegerType())] + list(MARC_SCHEMA.fields)
    )
    rows = [
        # run 1: bib1 bib1 (continuation with extra 999) mhld1 mhld1
        row(0, "b1", BIB, [("245", " ", " ", [("a", "T1")]),
                           ("852", " ", " ", [("a", "OLD HOLDINGS")]),
                           ("999", " ", " ", [("i", "bc1")])]),
        row(1, "b1", BIB, [("245", " ", " ", [("a", "dup")]),
                           ("999", " ", " ", [("i", "bc2")])]),
        row(2, "b1", MHLD, [("852", " ", " ", [("a", "LIB1")]),
                            ("866", " ", " ", [("a", "v.1-10")])]),
        row(3, "b1", MHLD, [("866", " ", " ", [("a", "v.11-20")])]),
        # run 2: plain bib
        row(4, "b2", BIB, [("245", " ", " ", [("a", "T2")])]),
        # error: mhld with id not matching previous record
        row(5, "b9", MHLD, [("866", " ", " ", [("a", "orphan")])]),
        # run 3 starts fine after the skipped error
        row(6, "b3", BIB, [("245", " ", " ", [("a", "T3")])]),
        # error: bib follows mhld of the same id
        row(7, "b3", MHLD, [("866", " ", " ", [("a", "v.1")])]),
        row(8, "b3", BIB, [("245", " ", " ", [("a", "T3 again")])]),
    ]
    df = spark.createDataFrame(rows, schema)
    out = combine_mult_bibs_mhlds(df)
    good = {r["record_id"]: r for r in
            out.filter(F.col("combine_error").isNull()).collect()}
    errs = [(r["record_id"], r["combine_error"]) for r in
            out.filter(F.col("combine_error").isNotNull()).collect()]

    # run 1: base fields minus clashing 852, + mhld fields, + both 999s
    tags = [f["tag"] for f in good["b1"]["datafields"]]
    assert tags == ["245", "852", "866", "866", "999", "999"]
    vals = [f["subfields"][0]["value"] for f in good["b1"]["datafields"]]
    assert vals == ["T1", "LIB1", "v.1-10", "v.11-20", "bc1", "bc2"]
    assert good["b2"]["datafields"][0]["subfields"][0]["value"] == "T2"
    # b3's clean bib survived as its own run
    assert good["b3"]["datafields"][0]["subfields"][0]["value"] == "T3"
    assert sorted(errs) == [("b3", "bib follows mhld"),
                            ("b9", "mhld out of order")]


def test_snapshot_diff_statuses(spark):
    """MarcDiff analog (MarcDiff.java:60-120): added / deleted /
    changed / unchanged over a full-outer key join."""
    from marc_solr_profiling_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", None), (2, "b", "x"), (3, "c", "y"), (4, "d", "z")],
        "id long, text string, extra string")
    new = spark.createDataFrame(
        [(2, "b", "x"), (3, "CHANGED", "y"), (4, "d", None), (5, "e", "w")],
        "id long, text string, extra string")
    got = {r["id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {1: "deleted", 2: "unchanged", 3: "changed",
                   4: "changed", 5: "added"}
    # restricting value_cols changes what counts as a change
    got2 = {r["id"]: r["status"]
            for r in snapshot_diff(old, new, value_cols=["text"]).collect()}
    assert got2[4] == "unchanged"  # extra-column difference ignored
    assert got2[3] == "changed"
