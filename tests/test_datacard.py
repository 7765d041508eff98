"""Per-language corpus data card: hand-computed percentiles on a tiny
frame plus the DuckDB twin on real testdata."""

from __future__ import annotations

import pytest

from marc_solr_profiling_spark.functions.textstats import corpus_datacard


def test_datacard_exact_percentiles(spark):
    # en docs with 1, 2, 3, 10 tokens; de with 4; a NULL lang -> 'und'
    rows = [
        (0, "en", "a"),
        (1, "en", "a b"),
        (2, "en", "a b c"),
        (3, "en", "a b c d e f g h i j"),
        (4, "de", "w x y z"),
        (5, None, "solo"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r["lang"]: r.asDict() for r in corpus_datacard(docs).collect()}
    assert set(got) == {"en", "de", "und"}
    en = got["en"]
    assert en["n_docs"] == 4 and en["total_tokens"] == 16
    # exact linear-interpolated percentiles over [1, 2, 3, 10]
    assert en["p50_tokens"] == pytest.approx(2.5)
    assert en["p90_tokens"] == pytest.approx(3 + 0.7 * 7)
    assert got["de"]["n_docs"] == 1 and got["de"]["p50_tokens"] == 4.0
    assert got["und"]["n_docs"] == 1


def test_datacard_twin_on_testdata(spark):
    import duckdb

    from marc_solr_profiling_spark.queries import ORACLE_SQL, QUERIES

    sf = "/root/testdata/sf0.001"
    got = {r["lang"]: tuple(r)[1:] for r in
           QUERIES["corpus_datacard"](spark, sf).collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = {r[0]: r[1:] for r in
            con.execute(ORACLE_SQL["corpus_datacard"]).fetchall()}
    assert set(got) == set(want) and len(got) >= 2
    for lang, g in got.items():
        w = want[lang]
        assert g[0] == w[0] and g[1] == w[1]
        for gx, wx in zip(g[2:], w[2:]):
            assert gx == pytest.approx(wx, abs=1e-9)
