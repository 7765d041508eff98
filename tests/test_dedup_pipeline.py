"""End-to-end dedup compositions added in round 4: fuzzy_dedup_keep
(MinHash -> LSH -> verify -> components -> keep-one) and
remove_duplicate_lines (corpus-wide first-occurrence line dedup)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from marc_solr_profiling_spark.functions.webclean import (
    remove_duplicate_lines,
)
from marc_solr_profiling_spark.operators.dedup import fuzzy_dedup_keep


BASE = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lam mu nu xi omicron pi rho sigma tau upsilon")


def test_fuzzy_dedup_keep_clusters_and_singletons(spark):
    rows = [
        (0, BASE),
        (1, BASE),                                 # exact dup of 0
        (2, BASE + " extra trailing words here"),  # near dup of 0
        (3, "completely different content with distinct tokens "
            "running through several unrelated shingles of text"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["cluster_id"], r["kept"])
           for r in fuzzy_dedup_keep(docs, threshold=0.2).collect()}
    assert set(got) == {0, 1, 2, 3}          # every input doc present
    assert got[0] == (0, True)               # representative = min key
    assert got[1] == (0, False)
    assert got[2] == (0, False)
    assert got[3] == (3, True)               # singleton keeps itself


def test_remove_duplicate_lines_first_occurrence_wins(spark):
    rows = [
        (0, "shared header\nunique zero\nshared footer"),
        (1, "shared header\nunique one\n\nshared footer"),
        (2, "shared header"),                 # everything removed
        (3, ""),                              # no lines at all
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_lines"], r["n_kept"], r["clean_md5"])
           for r in remove_duplicate_lines(docs).collect()}

    def h(s):
        return hashlib.md5(s.encode()).hexdigest()

    # doc 0 is first in corpus order: keeps all three lines
    assert got[0] == (3, 3, h("shared header\nunique zero\nshared footer"))
    # doc 1 loses both shared lines (doc 0 owns them), keeps its unique
    # line; the blank line never participates
    assert got[1] == (3, 1, h("unique one"))
    # doc 2's only line is owned by doc 0 -> empty cleaned text
    assert got[2] == (1, 0, h(""))
    # doc 3 has no nonempty lines
    assert got[3] == (0, 0, h(""))


def test_remove_duplicate_lines_normalizes_case_and_space(spark):
    docs = spark.createDataFrame(
        [(0, "The Same Line"), (1, "  the same line  ")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_kept"], r["clean_md5"])
           for r in remove_duplicate_lines(docs).collect()}
    # normalization collides them; doc 0 keeps its ORIGINAL (untrimmed,
    # original-case) text, doc 1 is emptied
    assert got[0] == (1, hashlib.md5(b"The Same Line").hexdigest())
    assert got[1] == (0, hashlib.md5(b"").hexdigest())


def test_new_oracle_twins_on_testdata(spark):
    """Driver-shaped comparison for both new queries at sf0.001."""
    import duckdb

    from marc_solr_profiling_spark.queries import ORACLE_SQL, QUERIES

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")

    sdf = {r["doc_id"]: (r["cluster_id"], r["kept"])
           for r in QUERIES["fuzzy_dedup_keep"](spark, sf).collect()}
    odf = {r[0]: (r[1], r[2]) for r in
           con.execute(ORACLE_SQL["fuzzy_dedup_keep"]).fetchall()}
    assert sdf == odf
    assert any(not v[1] for v in sdf.values())   # non-vacuous: drops exist

    sdf = {r["doc_id"]: (r["n_lines"], r["n_kept"], r["clean_md5"])
           for r in QUERIES["line_dedup_clean"](spark, sf).collect()}
    odf = {r[0]: (r[1], r[2], r[3]) for r in
           con.execute(ORACLE_SQL["line_dedup_clean"]).fetchall()}
    assert sdf == odf
    assert any(v[1] < v[0] for v in sdf.values())  # lines actually removed
