"""Serial-aware call-number volume lopping (SURVEY.md §2.9 depth item).

Re-expresses the Stanford lopping layer as pure Python + a grouped Spark
operator:

* ``profiling/src/edu/stanford/CallNumUtils.java:54-349`` — the
  removeLCVolSuffix / removeLCSerialVolSuffix / removeDeweyVolSuffix /
  removeDeweySerialVolSuffix / removeNonLCDeweyVolSuffix family, with the
  serial distinction (a serial's suffix may additionally start with a bare
  year or month, because issues shelve under one browse entry).
* ``core/src/org/solrmarc/tools/CallNumUtils.java:194-649`` — the cutter
  parsing helpers (getFirstLCcutter[Suffix], getSecondLCcutter[Suffix],
  getDeweyCutter[Suffix]) that locate WHERE a volume suffix can begin:
  only text after the last cutter is loppable, so class digits that look
  like years ("PN1998 .S589") are never lopped.
* ``profiling/src/edu/stanford/ItemUtils.java:34-134`` — lopItemCallnums:
  per-record grouping by library/location/scheme, longest-common-prefix
  lopping for non-LC/non-Dewey groups, and the ellipsis rule.
* ``profiling/src/edu/stanford/CallNumUtils.java:670-774`` —
  setLopped2LongestComnPfx.

The behavioral contract is the reference's own unit-test fixtures
(``profiling/test/src/edu/stanford/CallNum*LoppingUnitTests.java``),
mirrored in ``tests/test_lopping.py``.

Scale shape: every function here is a deterministic pure-string kernel.
The record-level operator (:func:`lop_item_callnums`) runs as one
``applyInPandas`` over ``groupBy(record_id)`` — a single hash shuffle on
the record key, group state bounded by items-per-record (tiny), no
driver-side iteration.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Pattern constants (semantics of CallNumUtils.java:28-46 / core :45-100)
# ---------------------------------------------------------------------------

# LC call numbers cannot begin with I, O, W, X, or Y (core :54)
_LC_CLASS_REQ = r"[A-HJ-NP-VZ][A-Z]{0,2} *\d+(?:\.\d+)?"
# non-cutter text: lowercase/digit word, or capital followed by non-digits
# (core :59 NOT_CUTTER) — a capital followed by digits is a cutter, not text
_NOT_CUTTER = r"(?:[\da-z]\w*|[A-Z]\D+\w*)"
_LC_CLASS_W_SUFFIX = rf"{_LC_CLASS_REQ}(?: +{_NOT_CUTTER})?"
_CUTTER = r"[A-Z]\d+"
_LC_CLASS_N_CUTTER = rf"{_LC_CLASS_W_SUFFIX} *\.?{_CUTTER}"
_LC_CLASS_N_CUTTER_RE = re.compile(_LC_CLASS_N_CUTTER)
_NOT_CUTTER_RE = re.compile(_NOT_CUTTER)
_PERIOD_CUTTER_RE = re.compile(r" *\." + _CUTTER)

_DEWEY_CLASS = r"\d{1,3}(?:\.\d+)?"
_DEWEY_MIN_CUTTER = r"[A-Z]\d{1,3}"
_DEWEY_CUTTER_TRAILING = _DEWEY_MIN_CUTTER + "[A-Z]+"
_DEWEY_CUTTER_SPACE_TRAILING = _DEWEY_MIN_CUTTER + " +[A-Z]+"

# volume designation vocabulary (CallNumUtils.java:28-41); alternation order
# matters ("part" before "pts?") and "[^a-z]t" anchors a bare T to a
# preceding non-letter so "IT 1 R" is never treated as tome 1
_PUNCT_PREFIX = r"(?:[\.:\/\(])?"
_NS_PREFIX = r"(?:n\.s\.?\,? ?)?"
_MONTHS = r"jan|feb|mar|apr|may|jun|jul|aug|sep|sept|oct|nov|dec"
_VOL_LETTERS = (
    r"[\:\/]?(?:bd|ed|hov|iss|issue|jahrg|new ser|no|part|pts?|ser|shanah"
    r"|[^a-z]t|v|vols?|vyp|" + _MONTHS + ")"
)
_VOL_NUMBERS = r"\d+(?:[\/-]\d+)?(?: \d{4}(?:[\/-]\d{4})?)?(?: ?suppl\.?)?"
_VOL_NUMBERS_LOOSER = r"\d+.*"
# faithful to CallNumUtils.java:34 including its stray escaped bracket —
# the optional group is effectively inert and ".*" does the work
_VOL_NUM_AS_LETTERS = r"[A-Z](?:[\/-]\[A-Z]+)?.*"

_VOL_RE = re.compile(
    _PUNCT_PREFIX + _NS_PREFIX + _VOL_LETTERS + r"\.? ?" + _VOL_NUMBERS,
    re.IGNORECASE,
)
_VOL_LOOSE_RE = re.compile(
    _PUNCT_PREFIX + _NS_PREFIX + _VOL_LETTERS + r"\.? ?" + _VOL_NUMBERS_LOOSER,
    re.IGNORECASE,
)
_VOL_LETTERS_RE = re.compile(
    _PUNCT_PREFIX + _NS_PREFIX + _VOL_LETTERS + r"[\/\. ]" + _VOL_NUM_AS_LETTERS,
    re.IGNORECASE,
)

_ADDL_VOL = (
    r"[\:\/]?(?:box|carton|fig|flat box|grade|half box|half carton|index"
    r"|large folder|large map folder|map folder|mfilm|mfiche|os box"
    r"|os folder|pl|reel|sheet|small folder|small map folder|suppl|tube"
    r"|series)"
)
_ADDL_VOL_RE = re.compile(_ADDL_VOL + ".*", re.IGNORECASE)

_FOUR_DIGIT_YEAR = r"(?:20|19|18|17|16|15|14)\d{2}"
_YEAR_RE = re.compile(r"\W *" + _FOUR_DIGIT_YEAR + r"\D.*", re.IGNORECASE)
_YEAR_END_RE = re.compile(r"\W *" + _FOUR_DIGIT_YEAR + r"$", re.IGNORECASE)
_LOOSE_MONTHS_RE = re.compile(
    _PUNCT_PREFIX + " *(?:" + _MONTHS + ")", re.IGNORECASE
)

# call numbers whose shape means lopping would destroy them
# (CallNumUtils.java:262 DO_NOT_LOP_START_REGEX)
_DO_NOT_LOP_RE = re.compile(r"^(?:[A-Z]DVD \d|[A-Z]CD \d|MFILM|MFICHE|V\.)")


# ---------------------------------------------------------------------------
# Cutter locators (semantics of core CallNumUtils.java:302-450, 513-649)
# ---------------------------------------------------------------------------


def get_first_lc_cutter_suffix(raw: str) -> str | None:
    """Text after the first cutter and before any period-led second cutter
    (core CallNumUtils.getFirstLCcutterSuffix, :333-387)."""
    m = _LC_CLASS_N_CUTTER_RE.search(raw)
    if m:
        pos = m.end()
        while pos < len(raw) and raw[pos] == " ":
            pos += 1
        # repetitions of NOT_CUTTER, keeping the last one (Java's repeated
        # group captures the final iteration)
        last_span = None
        while True:
            nm = _NOT_CUTTER_RE.match(raw, pos)
            if not nm or nm.end() == nm.start():
                break
            last_span = (nm.start(), nm.end())
            pos = nm.end()
        if last_span:
            result = raw[last_span[0]:last_span[1]].strip()
            end_last = last_span[1]
            if end_last < len(raw):
                # a second cutter must be period-preceded; everything up to
                # it (or to end of string) extends the suffix
                cm = _PERIOD_CUTTER_RE.search(raw, end_last)
                if cm:
                    if end_last < cm.start():
                        result = (
                            result.strip()
                            + " "
                            + raw[end_last:cm.start()].strip()
                        )
                else:
                    result = result + raw[end_last:]
            return result
    # looks like a second cutter but a later period-cutter proves otherwise
    m2 = re.search(_LC_CLASS_N_CUTTER + r" *(.*)\." + _CUTTER, raw)
    if m2 and m2.group(1):
        return m2.group(1).strip()
    if re.search(_LC_CLASS_N_CUTTER + r" \.\.\.$", raw):
        return " ..."
    return None


def get_second_lc_cutter(raw: str) -> str | None:
    """core CallNumUtils.getSecondLCcutter (:395-431)."""
    first_suffix = get_first_lc_cutter_suffix(raw)
    if not first_suffix:
        m = re.search(_LC_CLASS_N_CUTTER + r" *\.?(" + _CUTTER + ")", raw)
        return m.group(1).strip() if m else None
    ix = raw.find(first_suffix)
    if ix != -1:
        rest = raw[ix + len(first_suffix):].strip()
        m = re.search("(" + _CUTTER + ")", rest)
        if m:
            return m.group(1).strip()
    m = re.search(r"\.(" + _CUTTER + ")", first_suffix)
    return m.group(1).strip() if m else None


def get_second_lc_cutter_suffix(raw: str) -> str | None:
    """core CallNumUtils.getSecondLCcutterSuffix (:438-450)."""
    second = get_second_lc_cutter(raw)
    if second:
        ix = raw.find(second) + len(second)
        if ix < len(raw):
            out = raw[ix:].strip()
            return out if out else None
    return None


def _dewey_cutter_patterns() -> list[re.Pattern]:
    """The six cutter shapes of core getDeweyCutter (:513-575), in its
    trial order: each with then without a demanded non-cutter suffix."""
    with_suffix = [
        re.compile(
            _DEWEY_CLASS + r" *\.?(" + c + r")( +" + _NOT_CUTTER + ".*)"
        )
        for c in (
            _DEWEY_CUTTER_TRAILING,
            _DEWEY_MIN_CUTTER,
            _DEWEY_CUTTER_SPACE_TRAILING,
        )
    ]
    bare = [
        re.compile(_DEWEY_CLASS + r" *\.?(" + c + r")(.*)")
        for c in (
            _DEWEY_CUTTER_TRAILING,
            _DEWEY_MIN_CUTTER,
            _DEWEY_CUTTER_SPACE_TRAILING,
        )
    ]
    return with_suffix + bare


_DEWEY_PATS = _dewey_cutter_patterns()


def get_dewey_cutter(raw: str) -> str | None:
    """core CallNumUtils.getDeweyCutter (:513-575), including its
    second-find quirk: the suffixed patterns end in ".*" so a repeat find
    never succeeds, and matched pat1/pat2 fall through to the bare
    patterns — only the pat3 (space-trailing) path runs the
    letter-reassignment split."""
    pat1, pat2, pat3, pat4, pat5, pat6 = _DEWEY_PATS
    m = pat1.search(raw)
    if m:
        m = pat1.search(raw, m.end())
    else:
        m = pat2.search(raw)
        if m:
            m = pat2.search(raw, m.end())
        else:
            m = pat3.search(raw)
    if m:
        cutter, suffix = m.group(1), m.group(2)
        if len(suffix) == 0:
            return cutter.strip()
        if suffix.startswith(" ") or cutter.endswith(" "):
            return cutter.strip()
        ix = cutter.rfind(" ")
        return cutter[:ix] if ix != -1 else cutter.strip()
    for pat in (pat4, pat5, pat6):
        m = pat.search(raw)
        if m:
            return m.group(1).strip()
    return None


def get_dewey_cutter_suffix(raw: str) -> str | None:
    """core CallNumUtils.getDeweyCutterSuffix (:581-649)."""
    if not raw:
        return None
    result = None
    cutter = get_dewey_cutter(raw)
    if cutter is not None:
        ix = raw.find(cutter) + len(cutter)
        result = raw[ix:].strip()
    if not result:
        for pat in _DEWEY_PATS:
            m = pat.search(raw)
            if m:
                break
        if m:
            cutter, suffix = m.group(1), m.group(2)
            if suffix.strip():
                if suffix.startswith(" ") or cutter.endswith(" "):
                    result = suffix
                else:
                    ix = cutter.rfind(" ")
                    result = cutter[ix:] + suffix if ix != -1 else suffix
    if result is not None:
        result = result.strip()
    return result if result else None


# ---------------------------------------------------------------------------
# Suffix strippers (CallNumUtils.java:139-202, 351-369)
# ---------------------------------------------------------------------------


def _first_vol_match(text: str, include_addl: bool = True):
    """Try the volume patterns in the reference's chain order and return
    the first pattern's first match (CallNumUtils.java:83-98 pattern
    cascade)."""
    pats = [_VOL_RE, _VOL_LOOSE_RE, _VOL_LETTERS_RE]
    if include_addl:
        pats.append(_ADDL_VOL_RE)
    for pat in pats:
        m = pat.search(text)
        if m:
            return m
    return None


def remove_year_suffix(callnum: str) -> str:
    """Drop a suffix beginning with a 4-digit year
    (CallNumUtils.java:159-181)."""
    m = _YEAR_RE.search(callnum)
    if m and m.start() < len(callnum):
        return callnum[:m.start()].strip()
    m = _YEAR_END_RE.search(callnum)
    if m and m.start() < len(callnum):
        return callnum[:m.start()].strip()
    return callnum


def remove_loose_month_suffix(callnum: str) -> str:
    """CallNumUtils.java:190-202."""
    m = _LOOSE_MONTHS_RE.search(callnum)
    if m and m.start() < len(callnum):
        return callnum[:m.start()].strip()
    return callnum


def remove_addl_vol_suffix(callnum: str) -> str:
    """Archive-flavored designations: box, carton, series, index...
    (CallNumUtils.java:358-369)."""
    m = _ADDL_VOL_RE.search(callnum)
    if m and m.start() < len(callnum):
        return callnum[:m.start()].strip()
    return callnum


def remove_addl_serial_suffix(callnum: str) -> str:
    """Serial-only extras — bare year or loose month, whichever lops more
    (CallNumUtils.java:143-151)."""
    month_b4_year = remove_loose_month_suffix(callnum)
    year_b4_month = remove_year_suffix(callnum)
    if len(month_b4_year) > len(year_b4_month):
        return year_b4_month
    return month_b4_year


# ---------------------------------------------------------------------------
# LC / Dewey / other lopping (CallNumUtils.java:54-349)
# ---------------------------------------------------------------------------


def remove_lc_vol_suffix(raw: str) -> str:
    """Non-serial LC lop: only suffix text after the last cutter is
    eligible, so class digits that look like a year survive
    (CallNumUtils.java:54-118)."""
    lopped = raw
    suffix = get_second_lc_cutter_suffix(raw)
    if suffix is None:
        cut1suffix = get_first_lc_cutter_suffix(raw)
        if cut1suffix is not None:
            cut2 = get_second_lc_cutter(raw)
            if cut2 is not None:
                ix = cut1suffix.find(cut2)
                suffix = cut1suffix[:ix] if ix != -1 else cut1suffix
            else:
                suffix = cut1suffix
    if suffix is not None:
        m = _first_vol_match(suffix)
        if m:
            ix = raw.find(suffix) + m.start()
            if ix != -1 and ix < len(raw):
                lopped = raw[:ix].strip()
        lopped = remove_loose_month_suffix(lopped)
    else:
        lopped = remove_addl_vol_suffix(raw)
    # don't lop class digits that look like a year
    if len(lopped) < 4:
        return raw
    if lopped.endswith(":") or lopped.endswith("("):
        return lopped[:-1]
    return lopped


def remove_lc_serial_vol_suffix(raw: str) -> str:
    """Serial LC lop: also strip a bare year/month suffix — serial issues
    collapse to one browse entry (CallNumUtils.java:127-137)."""
    lopped = remove_lc_vol_suffix(raw)
    lopped_further = remove_addl_serial_suffix(lopped)
    if len(lopped_further) < 4:
        return lopped
    return lopped_further


def remove_dewey_vol_suffix(raw: str) -> str:
    """CallNumUtils.java:210-247."""
    lopped = raw
    cut_suffix = get_dewey_cutter_suffix(raw)
    if cut_suffix is None:
        return raw
    m = _first_vol_match(cut_suffix)
    if m:
        ix = raw.find(cut_suffix) + m.start()
        if ix != -1 and ix < len(raw):
            lopped = raw[:ix].strip()
    lopped = remove_loose_month_suffix(lopped)
    if lopped == raw:
        lopped = remove_addl_vol_suffix(raw)
    if lopped.endswith(":") or lopped.endswith("("):
        return lopped[:-1]
    return lopped


def remove_dewey_serial_vol_suffix(raw: str) -> str:
    """CallNumUtils.java:256-259."""
    return remove_addl_serial_suffix(remove_dewey_vol_suffix(raw))


def is_loppable_callnum(callnum: str) -> bool:
    """CallNumUtils.java:271-278: media/microform shapes are never
    lopped."""
    return _DO_NOT_LOP_RE.search(callnum) is None


def remove_non_lc_dewey_vol_suffix(raw: str, callnum_type: str = "OTHER") -> str:
    """CallNumUtils.java:290-323. SUDOC numbers skip the archive
    vocabulary; a result shorter than 5 chars means we lopped the class
    itself, so return the original."""
    if not is_loppable_callnum(raw):
        return raw
    lopped = raw
    if callnum_type != "SUDOC":
        lopped = remove_addl_vol_suffix(raw)
    if lopped == raw:
        m = _first_vol_match(raw, include_addl=False)
        if m and m.start() < len(raw):
            lopped = raw[:m.start()].strip()
    if len(lopped) < 5:
        return raw
    return lopped


def remove_non_lc_dewey_serial_vol_suffix(
    raw: str, callnum_type: str = "OTHER"
) -> str:
    """CallNumUtils.java:334-349."""
    if not is_loppable_callnum(raw):
        return raw
    lopped = remove_non_lc_dewey_vol_suffix(raw, callnum_type)
    if len(lopped) > 10:
        lopped_more = remove_addl_serial_suffix(lopped)
        if len(lopped_more) >= 5:
            lopped = lopped_more
    if len(lopped) < 5:
        return raw
    return lopped


def callnum_is_vol_suffix(raw: str | None) -> bool:
    """True when the whole call number is a volume suffix
    (CallNumUtils.java:391-409)."""
    if not raw:
        return False
    return _first_vol_match(raw) is not None


def get_lopped_callnum(raw: str, callnum_type: str, is_serial: bool) -> str:
    """Type dispatch (CallNumUtils.java:556-577)."""
    if callnum_type == "LC":
        return (
            remove_lc_serial_vol_suffix(raw)
            if is_serial
            else remove_lc_vol_suffix(raw)
        )
    if callnum_type == "DEWEY":
        return (
            remove_dewey_serial_vol_suffix(raw)
            if is_serial
            else remove_dewey_vol_suffix(raw)
        )
    return (
        remove_non_lc_dewey_serial_vol_suffix(raw, callnum_type)
        if is_serial
        else remove_non_lc_dewey_vol_suffix(raw, callnum_type)
    )


# ---------------------------------------------------------------------------
# Longest-common-prefix group lopping (CallNumUtils.java:670-774)
# ---------------------------------------------------------------------------


def _norm_char(c: str) -> str:
    """Per-char equality under the reference's comparator: periods and
    spaces are interchangeable, case-insensitive
    (Utils.compareNoPeriodsOrSpaces, core Utils.java:743-751)."""
    return "" if c in ". " else c.lower()


def common_prefix(s1: str, s2: str) -> str:
    """core Utils.getCommonPrefix (:761-774) under the no-periods-or-
    spaces comparator."""
    n = min(len(s1), len(s2))
    prefix_len = n
    for i in range(n):
        if _norm_char(s1[i]) != _norm_char(s2[i]):
            prefix_len = i
            break
    return s1[:prefix_len]


_LCP_YEAR = r"(?:20|19|18)\d{2}"
_LCP_YEAR_AT_END_RE = re.compile(" " + _LCP_YEAR + "$")
_LCP_YEAR_THEN_CHAR_RE = re.compile(" " + _LCP_YEAR + "[ -:]$")
_LCP_PARTIAL_YEAR_RE = re.compile(r" (?:20|19|18)\d{0,1}$")
_LCP_VOL_LETTERS_RE = re.compile(
    r"[ \.\(\:\/](?:bd|ed|jahrg|new ser|no|pts?|series|[^a-z]t|v|vols?|vyp)",
    re.IGNORECASE,
)
_LCP_ADDL_VOL_RE = re.compile(
    r"[ \.\(\:\/](?:box|carton|disc|flat box|grade|half box|half carton"
    r"|index|large folder|large map folder|map folder|reel|os box|os folder"
    r"|small folder|small map folder|suppl|tube|series).*",
    re.IGNORECASE,
)
_LCP_TOO_SHORT_RE = re.compile(
    r"^(?:mcd|mdvd|zdvd|mfilm|mfiche)$", re.IGNORECASE
)


def lop_to_longest_common_prefix(
    callnums: list[str], min_len: int = 4
) -> list[str]:
    """Assign each call number the group's longest common prefix, adjusted
    for trailing partial years and volume words
    (CallNumUtils.setLopped2LongestComnPfx, :670-774). Returns the lopped
    value per input (the full callnum when the prefix is too short)."""
    if not callnums:
        return []
    prefix = callnums[0]
    for cn in callnums[1:]:
        prefix = common_prefix(prefix, cn)
    # (the reference's `commonPrefix.trim()` at :682 discards its result,
    # so the untrimmed prefix flows on — kept for behavioral parity)

    # a common prefix ending in a partial year ("19", "20") means the
    # shared text stops mid-year — pull the whole year out of an item
    m = _LCP_PARTIAL_YEAR_RE.search(prefix)
    if m:
        callnum = callnums[0]
        for extra in (3, 2, 1):
            ln = len(prefix) + extra
            if len(callnum) >= ln:
                pat = _LCP_YEAR_THEN_CHAR_RE if extra == 3 else _LCP_YEAR_AT_END_RE
                ym = pat.search(callnum[:ln])
                if ym:
                    prefix = prefix[:ym.start()].strip()
                    break

    m = _LCP_VOL_LETTERS_RE.search(prefix)
    if not m:
        m = _LCP_ADDL_VOL_RE.search(prefix)
    if m:
        prefix = prefix[:m.start()].strip()

    if prefix.endswith(("-", ":", "(", "/")):
        prefix = prefix[:-1].strip()

    too_short = bool(_LCP_TOO_SHORT_RE.search(prefix)) or len(prefix) <= min_len
    if too_short:
        return list(callnums)
    return [prefix.strip()] * len(callnums)


def _apply_ellipsis(callnums: list[str], lopped: list[str]) -> list[str]:
    """When one item's full call number equals another item's lopped value,
    suffix it with ' ...' so browse shows it was a volume set
    (ItemUtils.ensureCorrectEllipsis, :107-125)."""
    lopped_set = {l for c, l in zip(callnums, lopped) if l != c}
    if not lopped_set:
        return lopped
    return [
        full + " ..." if full in lopped_set else lop
        for full, lop in zip(callnums, lopped)
    ]


def lop_items_in_record(
    callnums: list[str],
    callnum_types: list[str],
    libraries: list[str],
    home_locs: list[str],
    is_serial: bool,
) -> list[str]:
    """One record's item set through lopItemCallnums
    (ItemUtils.java:34-134): single items untouched; groups keyed by
    library:location:scheme; LC/Dewey groups lop per item, others lop to
    the longest common prefix; ellipsis fix applied per group."""
    n = len(callnums)
    if n == 0:
        return []
    if n == 1:
        return [callnums[0]]
    groups: dict[str, list[int]] = {}
    for i in range(n):
        scheme = callnum_types[i] if callnum_types[i] in ("LC", "DEWEY") else "OTHER"
        key = f"{libraries[i]}:{home_locs[i]}:{scheme}"
        groups.setdefault(key, []).append(i)
    out = list(callnums)
    for key, idxs in groups.items():
        if len(idxs) == 1:
            continue
        group_cns = [callnums[i] for i in idxs]
        scheme = key.rsplit(":", 1)[1]
        if scheme == "OTHER":
            lopped = lop_to_longest_common_prefix(group_cns, 4)
        else:
            lopped = [
                get_lopped_callnum(cn, callnum_types[i], is_serial)
                for cn, i in zip(group_cns, idxs)
            ]
        lopped = _apply_ellipsis(group_cns, lopped)
        for i, lop in zip(idxs, lopped):
            out[i] = lop
    return out


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


def lopped_callnum_udf(callnum_type: str = "LC", is_serial: bool = False):
    """Column-level lop for a homogeneous callnum column."""

    @F.pandas_udf(T.StringType())
    def _u(col: pd.Series) -> pd.Series:
        return col.map(
            lambda c: get_lopped_callnum(c, callnum_type, is_serial),
            na_action="ignore",
        )

    return _u


def lop_item_callnums(
    items: DataFrame,
    record_col: str = "record_id",
    callnum_col: str = "callnum",
    type_col: str = "callnum_type",
    library_col: str = "library",
    loc_col: str = "home_loc",
    serial_col: str | None = None,
) -> DataFrame:
    """Record-grouped lopping operator: adds ``lopped_callnum``.

    One ``applyInPandas`` over ``groupBy(record_col)`` — the single
    shuffle is on the record key; each group is one record's handful of
    items, so executor state stays O(items-per-record).
    """
    schema = T.StructType(
        items.schema.fields + [T.StructField("lopped_callnum", T.StringType())]
    )
    serial = serial_col

    def _lop(pdf: pd.DataFrame) -> pd.DataFrame:
        is_ser = bool(pdf[serial].iloc[0]) if serial else False
        pdf = pdf.copy()
        pdf["lopped_callnum"] = lop_items_in_record(
            pdf[callnum_col].fillna("").tolist(),
            pdf[type_col].fillna("OTHER").tolist(),
            pdf[library_col].fillna("").tolist(),
            pdf[loc_col].fillna("").tolist(),
            is_ser,
        )
        return pdf

    return items.groupBy(record_col).applyInPandas(_lop, schema=schema)
