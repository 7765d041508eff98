"""Call-number algebra (SURVEY.md §2.9): LC/Dewey validity, class
extraction, shelfkeys, reverse shelfkeys, volume lopping.

Re-expresses the semantics of ``core/src/org/solrmarc/tools/
CallNumUtils.java:161-1145`` (getLCShelfkey / getReverseShelfKey /
normalizeFloat / getDeweyB4Cutter) and the Stanford lopping layer
(``profiling/src/edu/stanford/ItemUtils.java:34-134`` lopItemCallnums) as
deterministic pure-Python functions + pandas UDFs, with native exprs for
the cheap facet keys (``StanfordIndexer.getLCCallNumCats``,
profiling/src/edu/stanford/StanfordIndexer.java:1375-1446).

Shelfkey principle (CallNumUtils.java:696-985): turn every numeric run into
a fixed-width sortable form — class number zero-padded left + decimal
right-padded, cutters as letter + fraction digits — so plain string order
equals shelf order. Reverse shelfkey = per-char complement over the sort
alphabet, so DESCENDING browse is an ASCENDING scan of the reversed key
(CallNumUtils.getReverseShelfKey).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# LC: 1-3 class letters, class number (int[.dec]), optional cutters/suffix
_LC_RE = re.compile(
    r"^\s*(?P<letters>[A-Z]{1,3})\s*"
    r"(?P<num>\d{1,4}(?:\.\d+)?)"
    r"(?P<rest>.*)$"
)
_CUTTER_RE = re.compile(r"\.?\s*(?P<letter>[A-Z])(?P<digits>\d+)")
_DEWEY_RE = re.compile(r"^\s*(?P<num>\d{1,3}(?:\.\d+)?)(?P<rest>.*)$")

# volume designations lopped from item call numbers
# (ItemUtils.lopItemCallnums, ItemUtils.java:34-134: vol/no/pt/bd... tails)
_LOP_RE = re.compile(
    r"\s+(v|vol|no|pt|bd|ser|t|new ser)[\.\s]+\S.*$", re.IGNORECASE
)


def is_valid_lc(callnum: str | None) -> bool:
    """LC validity (CallNumUtils.isValidLC semantics)."""
    return bool(callnum) and _LC_RE.match(callnum.upper()) is not None


def is_valid_dewey(callnum: str | None) -> bool:
    return bool(callnum) and _DEWEY_RE.match(callnum) is not None and any(
        c.isdigit() for c in callnum[:4]
    )


def lc_class_letters(callnum: str | None) -> str | None:
    m = _LC_RE.match(callnum.upper()) if callnum else None
    return m.group("letters") if m else None


def lc_class_digits(callnum: str | None) -> str | None:
    m = _LC_RE.match(callnum.upper()) if callnum else None
    if not m:
        return None
    return m.group("num").split(".")[0]


def lop_volume(callnum: str | None) -> str | None:
    """Drop trailing volume designations ('PS3537 .A832 v.3' -> 'PS3537
    .A832') so items of one serial collapse to one browse entry."""
    if callnum is None:
        return None
    return _LOP_RE.sub("", callnum).rstrip()


def _normalize_rest(rest: str) -> str:
    """Normalize everything after the class number: cutters become
    ' Ldigits' fraction tokens, and ALL text between/after cutters stays in
    the key IN POSITION (lowercased, numeric runs zero-padded) — dropping
    inter-cutter text (e.g. the '1999' in 'QA76 .A1 1999 .B2') would
    collide distinct call numbers onto one shelfkey and break browse order
    (CallNumUtils.java:760-830 keeps suffix tokens in sequence)."""
    out = []
    pos = 0
    for cm in _CUTTER_RE.finditer(rest):
        gap = rest[pos:cm.start()].strip().lower()
        if gap:
            out.append(re.sub(r"\d+", lambda x: x.group(0).zfill(6), gap))
        out.append(f"{cm.group('letter')}{cm.group('digits')}")
        pos = cm.end()
    residue = rest[pos:].strip().lower()
    if residue:
        # numeric runs zero-padded (year/volume suffixes sort naturally)
        out.append(re.sub(r"\d+", lambda x: x.group(0).zfill(6), residue))
    return " ".join(out)


def lc_shelfkey(callnum: str | None) -> str | None:
    """Sortable LC key: letters (3-padded) + class int (6-padded) + decimal
    (right-padded) + cutters as 'letter digits' fractions + folded residue.
    String order == shelf order (normalizeFloat discipline,
    CallNumUtils.java:760-830)."""
    if not callnum:
        return None
    m = _LC_RE.match(callnum.upper())
    if not m:
        return None
    letters = m.group("letters").ljust(3)
    num = m.group("num")
    whole, _, dec = num.partition(".")
    key = letters + whole.zfill(6) + "." + dec.ljust(6, "0")
    rest = _normalize_rest(m.group("rest"))
    if rest:
        key += " " + rest
    return key


def dewey_shelfkey(callnum: str | None) -> str | None:
    """Dewey: class zero-padded to 3 (getDeweyB4Cutter pad discipline) +
    decimal + normalized cutter (same case discipline as lc_shelfkey:
    uppercase cutter letters, lowercase residue)."""
    if not callnum:
        return None
    m = _DEWEY_RE.match(callnum)
    if not m:
        return None
    whole, _, dec = m.group("num").partition(".")
    key = whole.zfill(3) + "." + dec.ljust(8, "0")
    rest = _normalize_rest(m.group("rest").upper())
    if rest:
        key += " " + rest
    return key


# reverse shelfkey: per-char complement over the sort alphabet, so that
# descending order of keys == ascending order of reversed keys
_ALPHABET = " .0123456789abcdefghijklmnopqrstuvwxyz"
_REV = {c: _ALPHABET[len(_ALPHABET) - 1 - i] for i, c in enumerate(_ALPHABET)}


def reverse_shelfkey(key: str | None) -> str | None:
    """CallNumUtils.getReverseShelfKey: complement each char; unknown chars
    map to the top of the alphabet so they sort first in reverse."""
    if key is None:
        return None
    return "".join(_REV.get(c.lower(), " ") for c in key) + "~"


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


def _pudf(fn, rettype=T.StringType()):
    @F.pandas_udf(rettype)
    def _u(col: pd.Series) -> pd.Series:
        return col.map(fn, na_action="ignore")

    return _u


def lc_shelfkey_udf() -> Column:
    return _pudf(lc_shelfkey)


def dewey_shelfkey_udf() -> Column:
    return _pudf(dewey_shelfkey)


def reverse_shelfkey_udf() -> Column:
    return _pudf(reverse_shelfkey)


def lop_volume_udf() -> Column:
    return _pudf(lop_volume)


def lc_first_letter_expr(col: str) -> Column:
    """Facet key `lc_alpha_facet` analog: first class letter
    (StanfordIndexer.getLCCallNumCats, StanfordIndexer.java:1375-1446)."""
    c = F.upper(F.trim(F.col(col)))
    return F.when(c.rlike("^[A-Z]"), F.substring(c, 1, 1))


def lc_b4cutter_expr(col: str) -> Column:
    """Facet key `lc_b4cutter_facet`: class letters + number before the
    first cutter."""
    c = F.upper(F.trim(F.col(col)))
    return F.regexp_extract(c, r"^([A-Z]{1,3}\s*\d+(?:\.\d+)?)", 1)
