"""Record-cleaning scalar functions — re-expressions of the reference's
``org.solrmarc.tools.Utils`` / ``DateUtils`` string layer (SURVEY.md §2.9).

Native Spark expressions wherever the semantics allow (regexp cascade for
year extraction, checksum arithmetic for ISBN); pure-Python + pandas UDF
only for the genuinely iterative ones (the cleanData fixpoint loop,
natural-compare key padding).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# cleanData — fixpoint trailing-punct / bracket stripper
# (semantics of Utils.cleanData, core/src/org/solrmarc/tools/Utils.java:92-121:
#  loop to fixpoint: trim; drop trailing ,/;: ; drop trailing period iff
#  preceded by >=2 letters/digits; strip matched or unmatched outer brackets)
# ---------------------------------------------------------------------------

_TRAILING_PUNCT_RE = re.compile(r"[ ,/;:]+$")
_TRAILING_PERIOD_RE = re.compile(r"([\wÀ-ɏ]{2})\.$")


def clean_data(value: str | None) -> str | None:
    if value is None:
        return None
    cur = value
    while True:
        prev = cur
        cur = cur.strip()
        cur = _TRAILING_PUNCT_RE.sub("", cur)
        cur = _TRAILING_PERIOD_RE.sub(r"\1", cur)
        if cur.startswith("[") and cur.endswith("]"):
            cur = cur[1:-1]
        elif cur.startswith("[") and "]" not in cur:
            cur = cur[1:]
        elif cur.endswith("]") and "[" not in cur:
            cur = cur[:-1]
        if cur == prev:
            return cur


def clean_data_udf() -> Column:
    @F.pandas_udf(T.StringType())
    def _clean(col: pd.Series) -> pd.Series:
        return col.map(clean_data, na_action="ignore")

    return _clean


def clean_array_udf() -> Column:
    """cleanData over every element of an array<string> column (the shape
    getAllSubfields needs: one cleaned value per field instance)."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _clean(col: pd.Series) -> pd.Series:
        return col.map(
            lambda arr: [clean_data(v) for v in arr], na_action="ignore"
        )

    return _clean


# ---------------------------------------------------------------------------
# Year extraction — DateUtils.getYearFromString (DateUtils.java:46-115)
# pattern families: 'dddd', 'ddd?', 'dd--', '[dddd]', 'i.e. dddd'
# Expressed as a native regexp cascade (SQL-replicable).
# ---------------------------------------------------------------------------


def extract_year_expr(col: str | Column) -> Column:
    """First plausible 4-digit year: prefers an 'i.e. yyyy' correction, then
    a plain yyyy, then ddd? / dd-- imputation ('?'/'-' -> 0). Returns int
    or null. Accepts a Column so it can run inside array lambdas (e.g. the
    pub-date slider's 260c fallback)."""
    c = col if isinstance(col, Column) else F.col(col)
    ie = F.regexp_extract(c, r"i\.?\s?e\.?\s?(\d{4})", 1)
    plain = F.regexp_extract(c, r"(?:^|\D)(\d{4})(?:\D|$)", 1)
    three = F.regexp_extract(c, r"(?:^|\D)(\d{3})[?\-](?:\D|$)", 1)
    two = F.regexp_extract(c, r"(?:^|\D)(\d{2})--", 1)
    return (
        F.when(ie != "", ie.cast("int"))
        .when(plain != "", plain.cast("int"))
        .when(three != "", (three.cast("int") * 10))
        .when(two != "", (two.cast("int") * 100))
        .otherwise(F.lit(None).cast("int"))
    )


# ---------------------------------------------------------------------------
# ISBN validation — Utils.returnValidISBNs (Utils.java:599-629)
# ISBN-10: sum(i*digit_i) % 11 == 0 with X=10 as check digit;
# ISBN-13: alternating 1/3 weights % 10 == 0.
# Pure arithmetic over digit arrays (SQL-replicable).
# ---------------------------------------------------------------------------


def _digits(col: Column) -> Column:
    return F.regexp_replace(col, r"[^0-9Xx]", "")


def isbn10_valid_expr(col: str) -> Column:
    d = _digits(F.col(col))
    ten = F.length(d) == 10
    # weighted sum of first 9 digits (1..9), check char X counts as 10
    body = F.aggregate(
        F.sequence(F.lit(1), F.lit(9)),
        F.lit(0),
        lambda acc, i: acc + i * F.substring(d, 1, 9).substr(i, F.lit(1)).cast("int"),
    )
    check = F.upper(F.substring(d, 10, 1))
    checkval = F.when(check == "X", F.lit(10)).otherwise(check.cast("int"))
    return ten & (((body + 10 * checkval) % 11) == 0)


def isbn13_valid_expr(col: str) -> Column:
    d = _digits(F.col(col))
    thirteen = (F.length(d) == 13) & ~d.rlike("[Xx]")
    total = F.aggregate(
        F.sequence(F.lit(1), F.lit(13)),
        F.lit(0),
        lambda acc, i: acc
        + F.when(i % 2 == 1, F.lit(1)).otherwise(F.lit(3))
        * d.substr(i, F.lit(1)).cast("int"),
    )
    return thirteen & ((total % 10) == 0)


def isbn_valid_expr(col: str) -> Column:
    return isbn10_valid_expr(col) | isbn13_valid_expr(col)


# ---------------------------------------------------------------------------
# Natural-compare sort key — StringNaturalCompare.java:1-152 semantics
# (u99 < u100): zero-pad digit runs to fixed width -> plain string order.
# Iterative per-run padding -> pandas UDF (not expressible natively).
# ---------------------------------------------------------------------------

_DIGIT_RUN_RE = re.compile(r"\d+")


def natural_sort_key(value: str | None, width: int = 12) -> str | None:
    if value is None:
        return None
    return _DIGIT_RUN_RE.sub(lambda m: m.group(0).zfill(width), value)


def natural_sort_key_udf(width: int = 12) -> Column:
    @F.pandas_udf(T.StringType())
    def _key(col: pd.Series) -> pd.Series:
        return col.map(lambda v: natural_sort_key(v, width), na_action="ignore")

    return _key


# ---------------------------------------------------------------------------
# trimNearDuplicates — Utils.java:478-495: drop values that are substrings
# of other values in a (small) set.
# ---------------------------------------------------------------------------


def trim_near_duplicates_expr(arr_col: str) -> Column:
    """Keep v unless another element strictly contains it. Values are
    deduplicated first (the reference operates on LinkedHashSet)."""
    a = F.array_distinct(F.col(arr_col))
    return F.filter(
        a,
        lambda v: ~F.exists(a, lambda o: (o != v) & o.contains(v)),
    )
