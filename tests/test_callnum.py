"""Pure-function tier for call-number algebra — mirroring
core/test/src/org/solrmarc/tools/CallNumberUnitTests.java and the Stanford
lopping tests (profiling/test/src/edu/stanford/CallNum*LoppingUnitTests)."""

from pyspark.sql import functions as F

from marc_solr_profiling_spark.functions.callnum import (
    dewey_shelfkey, is_valid_dewey, is_valid_lc, lc_b4cutter_expr,
    lc_class_digits, lc_class_letters, lc_first_letter_expr, lc_shelfkey,
    lc_shelfkey_udf, lop_volume, reverse_shelfkey,
)


def test_lc_validity_and_parts():
    assert is_valid_lc("QA76.73 .S67 2005")
    assert is_valid_lc("M5 .L3 V.188")
    assert not is_valid_lc("not a callnum")
    assert not is_valid_lc(None)
    assert lc_class_letters("QA76.73 .S67") == "QA"
    assert lc_class_digits("QA76.73 .S67") == "76"


def test_lc_shelfkey_orders_correctly():
    # the classic trap: QA9 shelves before QA76, plain string order lies
    keys = [lc_shelfkey(c) for c in ["QA76 .A1", "QA9 .B2", "QA76.5 .C3"]]
    assert sorted(keys) == [
        lc_shelfkey("QA9 .B2"), lc_shelfkey("QA76 .A1"),
        lc_shelfkey("QA76.5 .C3"),
    ]
    # cutters sort decimally: .S67 < .S7 as fractions? reference treats
    # cutter digits as a fraction: S67 > S7? '67' vs '7' string order gives
    # S67 < S7 which IS the decimal-fraction order (.67 < .7)
    a, b = lc_shelfkey("PS3537 .S67"), lc_shelfkey("PS3537 .S7")
    assert a < b


def test_dewey_shelfkey_pads_class():
    # 45.2 shelves before 300 (zero-padded class)
    assert dewey_shelfkey("45.2 .B3") < dewey_shelfkey("300 .A1")
    assert is_valid_dewey("813.54")
    assert not is_valid_dewey("QA76")


def test_reverse_shelfkey_inverts_order():
    ks = sorted(filter(None, (lc_shelfkey(c) for c in
                              ["QA9 .B2", "QA76 .A1", "QA76.5 .C3", "B12 .A1"])))
    rev = [reverse_shelfkey(k) for k in ks]
    assert sorted(rev) == list(reversed(rev))  # ascending reversed == descending
    assert reverse_shelfkey(None) is None


def test_lop_volume():
    assert lop_volume("PS3537 .A832 v.3") == "PS3537 .A832"
    assert lop_volume("M5 .L3 no. 188 1900Z") == "M5 .L3"
    assert lop_volume("QA76.73 .S67 2005") == "QA76.73 .S67 2005"  # year kept
    assert lop_volume(None) is None


def test_spark_exprs(spark):
    df = spark.createDataFrame(
        [("QA76.73 .S67 2005",), ("M5 .L3 V.188",), ("813.54 .X9",)],
        "callnum string",
    )
    rows = df.select(
        lc_first_letter_expr("callnum").alias("l1"),
        lc_b4cutter_expr("callnum").alias("b4"),
        lc_shelfkey_udf()(F.col("callnum")).alias("key"),
    ).collect()
    assert [r["l1"] for r in rows] == ["Q", "M", None]
    assert rows[0]["b4"] == "QA76.73"
    assert rows[1]["b4"] == "M5"
    assert rows[0]["key"].startswith("QA 000076.730000")
