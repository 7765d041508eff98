"""Golden-corpus parameterized tier over the fieldspec DSL.

The analog of the reference's data-driven indexing tests
(``core/test/src/org/solrmarc/testUtils/ParameterizedIndexTest.java:14-25``
driven by ``indextest.txt``): each line of
``tests/data/golden_fieldspec.txt`` is (record_id, extractor, expected
pipe-separated values). The corpus is serialized to binary MARC with the
repo's writer and read back through ``read_marc_binary``, so the tier
also exercises the ISO 2709 round trip for every assertion.
"""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import functions as F

from marc_solr_profiling_spark.operators.fieldspec import (
    all_alpha_except_expr,
    all_searchable_expr,
    all_subfields_expr,
    combined_orig_vernacular_expr,
    delete_subfields_expr,
    field_list_expr,
    first_field_expr,
    indicator_filtered_values_expr,
    longest_value_expr,
    stanford_all_fields_expr,
)
from marc_solr_profiling_spark.sources.marc import (
    encode_record,
    read_marc_binary,
)

_DATA = os.path.join(os.path.dirname(__file__), "data", "golden_fieldspec.txt")

# --- the golden corpus ------------------------------------------------------

GOLDEN_RECORDS = [
    # (leader, controlfields, datafields)
    (
        "01234cam a2200000 a 4500",
        [("001", "g1"),
         ("008", "920403s1992    caua     b    000 0 eng  ")],
        [
            ("245", "1", "4", [("a", "The golden record"),
                               ("b", "a test subtitle"),
                               ("c", "by Tester")]),
            ("100", "1", " ", [("a", "Tester, Tess"), ("d", "1960-")]),
            ("650", " ", "0", [("a", "Testing"), ("x", "History")]),
            ("650", " ", "0", [("a", "Golden sets")]),
            ("880", "1", " ", [("6", "245-01"), ("a", "金色记录"),
                               ("b", "副标题")]),
            ("024", "1", " ", [("a", "724381234567")]),
            ("024", "7", " ", [("a", "1234-5678"), ("2", "doi")]),
            ("260", " ", " ", [("a", "San Francisco :"),
                               ("b", "Test Press,"), ("c", "1992.")]),
            ("260", " ", " ", [("a", "SF"), ("b", "TP")]),
            ("999", " ", " ", [("a", "QA76 .T47 1992")]),
        ],
    ),
    (
        "01234cam a2200000 a 4500",
        [("001", "g2"),
         ("008", "750727s1975    enk           000 0 fre  ")],
        [
            ("245", "0", "0", [("a", "Short title")]),
            ("700", "1", " ", [("a", "Other, Guy")]),
            ("905", " ", " ", [("a", "keepme")]),
            ("999", " ", " ", [("a", "ZZ99")]),
        ],
    ),
]


@pytest.fixture(scope="module")
def golden_df(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("golden") / "golden.mrc"
    blob = b"".join(encode_record(*r) for r in GOLDEN_RECORDS)
    path.write_bytes(blob)
    bin_df = spark.read.format("binaryFile").load(str(path))
    df = read_marc_binary(bin_df).cache()
    assert df.filter(F.col("parse_error").isNotNull()).count() == 0
    return df


# --- extractor grammar ------------------------------------------------------

_NAMED_RE = re.compile(r"^(\w+)\((.*)\)$")


def build_extractor(spec: str):
    """extractor string -> (df -> Column) builder. Raw fieldspecs go
    through field_list_expr; name(args) forms map to the named operators
    (args separated by ';')."""
    m = _NAMED_RE.match(spec)
    if not m:
        return lambda df: (df, field_list_expr(spec))
    name, raw_args = m.group(1), m.group(2)
    args = [a.strip() for a in raw_args.split(";")] if raw_args else []
    if name == "first":
        return lambda df: (df, F.array(first_field_expr(args[0])))
    if name == "longest":
        return lambda df: (df, F.array(longest_value_expr(args[0])))
    if name == "combined":
        return lambda df: (df, combined_orig_vernacular_expr(args[0]))
    if name == "alphaExcept":
        return lambda df: (df, all_alpha_except_expr(args[0]))
    if name == "allSub":
        sep = args[1] if len(args) > 1 else " "
        return lambda df: (df, all_subfields_expr(args[0], separator=sep))
    if name == "get024":
        tag, ind1, codes = args
        return lambda df: (
            df, indicator_filtered_values_expr(tag, ind1, codes)
        )
    if name == "delete":
        tag, codes, spec2 = args
        return lambda df: (
            df.withColumn("_mod", delete_subfields_expr(tag, codes)),
            field_list_expr(spec2, datafields="_mod"),
        )
    if name == "searchable":
        lo, hi = args[0].split("-")
        return lambda df: (
            df, F.array(all_searchable_expr(int(lo), int(hi)))
        )
    if name == "stanfordAll":
        lo, hi = args[0].split("-")
        return lambda df: (
            df, F.array(stanford_all_fields_expr(int(lo), int(hi)))
        )
    raise ValueError(f"unknown extractor: {name}")


def load_cases():
    cases = []
    with open(_DATA, encoding="utf-8") as fh:
        for ln, line in enumerate(fh, 1):
            line = line.rstrip("\n")
            if not line.strip() or line.lstrip().startswith("#"):
                continue
            rid, extractor, expected = line.split(", ", 2)
            cases.append(
                pytest.param(rid, extractor, expected,
                             id=f"L{ln}:{rid}:{extractor}")
            )
    return cases


@pytest.mark.parametrize("rid,extractor,expected", load_cases())
def test_golden_fieldspec(golden_df, rid, extractor, expected):
    ordered = False
    if expected.startswith("*ordered*"):
        ordered = True
        expected = expected[len("*ordered*"):].strip()
    exp_vals = expected.split("|") if expected else []

    df, col = build_extractor(extractor)(golden_df)
    got = (
        df.filter(F.col("record_id") == rid)
        .select(col.alias("v"))
        .first()["v"]
    )
    got_vals = [v for v in (got or []) if v not in (None, "")]
    if ordered:
        assert got_vals == exp_vals
    else:
        assert sorted(got_vals) == sorted(exp_vals)
