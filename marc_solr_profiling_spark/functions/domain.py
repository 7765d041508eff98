"""Domain scalar functions from SURVEY.md §2.9 — native when/rlike decision
trees wherever the semantics allow, so they stay inside whole-stage codegen.

Each function cites the reference implementation it re-expresses; the pytest
tier mirrors the reference's pure-function unit tests
(core/test/src/org/solrmarc/tools/*UnitTests.java).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Format classification — leader/008-driven enum
# (FormatUtils.java:34-230; StanfordIndexer.java:272-329: leader byte 06 =
# record type, byte 07 = bibliographic level)
# ---------------------------------------------------------------------------


def format_expr(leader: str = "leader", f008: str = "f008") -> Column:
    """Record format from leader bytes 06/07 (+008 fallback), as one
    when/otherwise tree (the §4 'big when/otherwise decision trees')."""
    t = F.substring(F.col(leader), 7, 1)   # type of record (byte 06)
    lvl = F.substring(F.col(leader), 8, 1)  # bib level (byte 07)
    return (
        F.when(t.isin("a", "t") & lvl.isin("b", "s"), "Serial")
        .when(t.isin("a", "t") & lvl.isin("a", "c", "d", "m"), "Book")
        .when(t == "e", "Map")
        .when(t == "f", "Map")
        .when(t.isin("c", "d"), "MusicScore")
        .when(t == "i", "SoundRecording")  # nonmusical
        .when(t == "j", "MusicRecording")
        .when(t == "g", "Video")
        .when(t == "k", "Image")
        .when(t == "m", "ComputerFile")
        .when(t == "p", "MixedMaterials")
        .when(t == "o", "Kit")
        .when(t == "r", "Object")
        .otherwise("Other")
    )


def is_mhld_expr(leader: str = "leader") -> Column:
    """MHLD (holdings) detection from leader byte 06 in {u,v,x,y}
    (MarcUtils.isMHLDRecord, MarcUtils.java:1167-1180)."""
    return F.substring(F.col(leader), 7, 1).isin("u", "v", "x", "y")


# ---------------------------------------------------------------------------
# Era expansion — 045a code pair -> enumerated era codes
# (MarcUtils.getEraStrings range expansion, MarcUtils.java:1186-1256:
#  'a9b3' -> a9, b0, b1, b2, b3; single era 'd6' -> d6)
# ---------------------------------------------------------------------------

_ERA_LETTERS = "abcdefghijklmnopqrstuvwxy"


def expand_era(code: str | None) -> list[str]:
    """Pure-Python era range expansion (shared by UDF and tests)."""
    if not code:
        return []
    code = code.strip()
    if len(code) == 2 and code[0] in _ERA_LETTERS and code[1].isdigit():
        return [code]
    if (
        len(code) == 4
        and code[0] in _ERA_LETTERS and code[1].isdigit()
        and code[2] in _ERA_LETTERS and code[3].isdigit()
    ):
        lo = _ERA_LETTERS.index(code[0]) * 10 + int(code[1])
        hi = _ERA_LETTERS.index(code[2]) * 10 + int(code[3])
        if hi < lo:
            return []
        return [
            f"{_ERA_LETTERS[i // 10]}{i % 10}" for i in range(lo, hi + 1)
        ]
    return []


def era_expr(col: str) -> Column:
    """Native expansion: sequence over the numeric era index, mapped back to
    letter+digit (no UDF — transform over sequence)."""
    c = F.col(col)
    single = c.rlike("^[a-y][0-9]$")
    pair = c.rlike("^[a-y][0-9][a-y][0-9]$")
    letters = F.lit(_ERA_LETTERS)

    def idx(letter: Column, digit: Column) -> Column:
        return (F.instr(letters, letter) - 1) * 10 + digit.cast("int")

    lo = idx(F.substring(c, 1, 1), F.substring(c, 2, 1))
    hi = idx(F.substring(c, 3, 1), F.substring(c, 4, 1))
    expanded = F.transform(
        F.sequence(lo, hi),
        lambda i: F.concat(
            F.substring(letters, 1, 25).substr(
                (i / 10).cast("int") + 1, F.lit(1)
            ),
            (i % 10).cast("string"),
        ),
    )
    return (
        F.when(single, F.array(c))
        .when(pair & (hi >= lo), expanded)
        .otherwise(F.array().cast("array<string>"))
    )


# ---------------------------------------------------------------------------
# URL classification — 856 ind2 + $3/$z keyword rules
# (MarcUtils.java:1526-1611: ind2=0 -> fulltext, ind2=2 -> supplemental,
#  $z/$3 containing 'table of contents'/'sample text'/... -> supplemental)
# ---------------------------------------------------------------------------

_SUPPL_RE = (
    "(?i)(table of contents|abstract|description|sample text|finding aid)"
)


def url_class_expr(ind2: str, note: str) -> Column:
    """'fulltext' | 'supplemental' | 'unknown' from an 856 field's ind2 and
    its $z/$3 note text."""
    n = F.coalesce(F.col(note), F.lit(""))
    supplemental_note = n.rlike(_SUPPL_RE)
    i2 = F.col(ind2)
    return (
        F.when(supplemental_note, "supplemental")
        .when(i2 == "2", "supplemental")
        .when(i2.isin("0", "1"), "fulltext")
        .otherwise("unknown")
    )


# ---------------------------------------------------------------------------
# Sortable title — non-filing chars via ind2, lowercase
# (MarcUtils.getSortableTitle, MarcUtils.java:1394-1442)
# ---------------------------------------------------------------------------


def sortable_title_expr(title: str, ind2: str) -> Column:
    """Drop the leading non-filing characters (count in ind2 when it is a
    digit), trim, lowercase — the 245 sort key."""
    skip = F.when(
        F.col(ind2).rlike("^[0-9]$"), F.col(ind2).cast("int")
    ).otherwise(F.lit(0))
    t = F.col(title)
    return F.lower(F.trim(t.substr(skip + 1, F.length(t))))


# ---------------------------------------------------------------------------
# Language splitting — smushed 041a split into 3-char codes
# (StanfordIndexer.java:340-357)
# ---------------------------------------------------------------------------


def split_lang_codes_expr(col: str) -> Column:
    """'engfreger' -> [eng, fre, ger]; non-multiple-of-3 values pass through
    whole (the reference logs and keeps them)."""
    c = F.col(col)
    n = F.length(c)
    split3 = F.transform(
        F.sequence(F.lit(0), (n / 3).cast("int") - 1),
        lambda i: c.substr(i * 3 + 1, F.lit(3)),
    )
    # n > 0 guard: an empty string satisfies n % 3 == 0 but sequence(0, -1)
    # yields a DESCENDING [0, -1] (two phantom codes); the reference emits
    # nothing for empty 041a values
    return F.when((n > 0) & (n % 3 == 0), split3).otherwise(
        F.when(n > 0, F.array(c)).otherwise(F.array().cast("array<string>"))
    )
