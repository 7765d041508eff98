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


def format_full_expr(
    leader: str = "leader",
    f008: str = "f008",
    f006: str = "f006",
    has_502: str | None = None,
    title_h: str | None = None,
) -> Column:
    """Format classification with the 008/006 fallbacks and the
    thesis/microformat overrides (FormatUtils.java:34-230):

    - leader/06 switch, with byte gates: 'g' is Video only when 008/33 in
      [mv]; 'k' is Image only when 008/33 in [ikpst]; 'm' is ComputerFile
      only when 008/26 == 'a'  (FormatUtils.getFormatsPerLdrAnd008)
    - serials: leader/07 's' + 008/21 (m -> Book [monographic series],
      n -> Newspaper, p/blank -> Journal/Periodical); 006/00 's' + 006/04
      fallback  (FormatUtils.getSerialFormat, getSerialFormat006)
    - thesis: presence of a 502 field wins (FormatUtils.isThesis);
      microformat: 245h containing 'microform'
      (FormatUtils.isMicroformat)

    ``has_502`` is a boolean column name; ``title_h`` a string column
    (both optional — pass when the caller has them extracted). One
    when/otherwise tree, pure codegen.
    """
    t = F.substring(F.col(leader), 7, 1)
    lvl = F.substring(F.col(leader), 8, 1)
    c008 = F.coalesce(F.col(f008), F.lit(""))
    b21 = F.substring(c008, 22, 1)
    b26 = F.substring(c008, 27, 1)
    b33 = F.substring(c008, 34, 1)
    c006 = F.coalesce(F.col(f006), F.lit(""))
    s006 = F.substring(c006, 1, 1)
    b04_006 = F.substring(c006, 5, 1)

    def serial_from(ch: Column) -> Column:
        return (
            F.when(ch == "m", "Book")
            .when(ch == "n", "Newspaper")
            .when(ch == "p", "Journal/Periodical")
            .when(ch == " ", "Journal/Periodical")
            .otherwise(F.lit(None).cast("string"))
        )

    serial = F.when(lvl == "s", serial_from(b21)).otherwise(
        F.lit(None).cast("string")
    )
    serial = F.coalesce(
        serial,
        F.when(s006 == "s", serial_from(b04_006)).otherwise(
            F.lit(None).cast("string")
        ),
    )

    base = (
        F.when(t.isin("a", "t") & lvl.isin("a", "m"), "Book")
        .when(t.isin("b", "p"), "Manuscript/Archive")
        .when(t.isin("c", "d"), "Music - Score")
        .when(t.isin("e", "f"), "Map/Globe")
        .when((t == "g") & b33.rlike("^[mv]$"), "Video")
        .when(t == "i", "Sound Recording")
        .when(t == "j", "Music - Recording")
        .when((t == "k") & b33.rlike("^[ikpst]$"), "Image")
        .when((t == "m") & (b26 == "a"), "Computer File")
        .when(t.isin("o", "r"), "Other")
        .otherwise(F.lit(None).cast("string"))
    )
    result = F.coalesce(serial, base, F.lit("Other"))
    if has_502 is not None:
        result = F.when(F.col(has_502), "Thesis").otherwise(result)
    if title_h is not None:
        result = F.when(
            F.coalesce(F.col(title_h), F.lit("")).rlike("(?i)microform"),
            "Microformat",
        ).otherwise(result)
    return result


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
# Sortable author + author-title search keys
# (MarcUtils.getSortableAuthor, MarcUtils.java:1453-1491;
#  StanfordIndexer.getAuthorTitleSearchFields, StanfordIndexer.java:570-675)
# ---------------------------------------------------------------------------

# records with no 100/110/111 must sort LAST: the reference appends
# Character.MAX_CODE_POINT + ' ' (MarcUtils.java:1474-1478)
MISSING_AUTHOR_SENTINEL = "\U0010ffff "


def sortable_author_expr(author: str, title_sort: str) -> Column:
    """Author sort key: main-entry name (100|110|111 alpha subfields,
    already extracted into ``author``) + uniform/245 title sort string;
    missing author -> MAX_CODE_POINT sentinel so those records shelve
    after every real name. Lowercasing is the field-type's job in the
    reference (schema 'properties should convert to lowercase'), done
    here inline for self-containment."""
    a = F.coalesce(F.col(author), F.lit(""))
    head = F.when(
        F.trim(a) == "", F.lit(MISSING_AUTHOR_SENTINEL)
    ).otherwise(F.concat(a, F.lit(" ")))
    return F.lower(
        F.trim(F.concat(head, F.coalesce(F.col(title_sort), F.lit(""))))
    )


def author_title_key_expr(author: str, uniform_title: str,
                          title: str) -> Column:
    """Author-title search key: 1xx author + (240 uniform title if present,
    else 245) — the StanfordIndexer.java:570-675 concatenation; 7xx
    added-entry variants gate on a $t being present, which the caller
    expresses by passing the $t extraction as ``title``. Null author ->
    null key (no author-title entry without an author)."""
    t = F.coalesce(
        F.nullif(F.trim(F.coalesce(F.col(uniform_title), F.lit(""))),
                 F.lit("")),
        F.col(title),
    )
    a = F.nullif(F.trim(F.coalesce(F.col(author), F.lit(""))), F.lit(""))
    return F.when(
        a.isNotNull() & t.isNotNull(), F.concat_ws(" ", a, t)
    ).otherwise(F.lit(None).cast("string"))


# ---------------------------------------------------------------------------
# Pub-date logic — u-digit imputation, sanity window, date groups
# (PublicationUtils.java:44-834; DateUtils.getCenturyString,
#  DateUtils.java:127-152)
# ---------------------------------------------------------------------------

EARLIEST_VALID_YEAR = 500  # PublicationUtils.java:28


def _valid_year(y: Column, current_year: int) -> Column:
    return (y >= EARLIEST_VALID_YEAR) & (y <= current_year + 1)


def pub_date_display_expr(date1: str, current_year: int) -> Column:
    """Display pub date from 008 date1 (getPubDate semantics,
    PublicationUtils.java:115-151): dddd -> the year when in the sanity
    window [500, current+1]; dddu -> 'ddd0s' (decade) when plausible;
    dduu -> '(dd+1)th century'; else null. ``current_year`` is passed in
    for determinism (SolrIndexer datestamp discipline, SURVEY.md §2.9)."""
    d = F.coalesce(F.col(date1), F.lit(""))
    y4 = d.rlike("^[0-9]{4}$")
    y3u = d.rlike("^[0-9]{3}u$")
    y2u = d.rlike("^[0-9]{2}uu$")
    yr = F.when(y4, d.cast("int"))
    first3 = F.substring(d, 1, 3)
    first2 = F.substring(d, 1, 2)
    century = first2.cast("int") + 1
    suffix = (
        F.when(century % 100 == 11, "th")
        .when(century % 100 == 12, "th")
        .when(century % 100 == 13, "th")
        .when(century % 10 == 1, "st")
        .when(century % 10 == 2, "nd")
        .when(century % 10 == 3, "rd")
        .otherwise("th")
    )
    return (
        F.when(y4 & _valid_year(yr, current_year), d)
        .when(
            y3u & (first3.cast("int") <= current_year // 10),
            F.concat(first3, F.lit("0s")),
        )
        .when(
            y2u & (first2.cast("int") <= current_year // 100),
            F.concat(century.cast("string"), suffix, F.lit(" century")),
        )
        .otherwise(F.lit(None).cast("string"))
    )


def pub_date_sort_expr(date1: str, current_year: int) -> Column:
    """Sortable pub date (getPubDateSort, PublicationUtils.java:169-189):
    dddd kept; dddu -> 'ddd-'; dduu -> 'dd--' (hyphens sort before '0', so
    partial dates shelve at the head of their decade/century)."""
    d = F.coalesce(F.col(date1), F.lit(""))
    y4 = d.rlike("^[0-9]{4}$")
    y3u = d.rlike("^[0-9]{3}u$")
    y2u = d.rlike("^[0-9]{2}uu$")
    yr = F.when(y4, d.cast("int"))
    first3 = F.substring(d, 1, 3)
    first2 = F.substring(d, 1, 2)
    return (
        F.when(y4 & _valid_year(yr, current_year), d)
        .when(
            y3u & (first3.cast("int") <= current_year // 10),
            F.concat(first3, F.lit("-")),
        )
        .when(
            y2u & (first2.cast("int") <= current_year // 100),
            F.concat(first2, F.lit("--")),
        )
        .otherwise(F.lit(None).cast("string"))
    )


def pub_date_groups_expr(year: str, current_year: int) -> Column:
    """Date-group facet values for an exact year (getPubDateGroups +
    getPubDateGroupsForYear, PublicationUtils.java:484-501, 778-790):
    'This year' (>= current-1), 'Last 3 years' (>= current-3),
    'Last 10 years' (>= current-10), 'Last 50 years' (>= current-50),
    else 'More than 50 years ago'. Returns the array of applicable
    groups (a year can belong to several, like the reference's Set)."""
    y = F.col(year).cast("int")
    groups = F.array(
        F.when(y >= current_year - 1, "This year"),
        F.when(y >= current_year - 3, "Last 3 years"),
        F.when(y >= current_year - 10, "Last 10 years"),
        F.when(y >= current_year - 50, "Last 50 years"),
        F.when((y < current_year - 50) & (y > -1), "More than 50 years ago"),
    )
    return F.when(
        y.isNotNull(), F.filter(groups, lambda g: g.isNotNull())
    ).otherwise(F.array().cast("array<string>"))


def pub_date_slider_expr(
    f008: str | Column, f260c_vals: str | Column, current_year: int
) -> Column:
    """Pub-year 'slider' values — the multi-year expansion behind
    ``pub_year_itsim`` (getPubDateSliderVals, PublicationUtils.java:271-384,
    called from StanfordIndexer.java:1104-1106 with the raw 260c value set).

    From an 008 of length >= 15: date1 = bytes 7-10 with a trailing 'u'
    imputed to '0', date2 = bytes 11-14 with 'u' imputed to '9' (both via
    get3or4DigitYear, PublicationUtils.java:665-681: dddd kept unless
    '9999', dddu imputed only when its decade has already started, then the
    [500, current+1] sanity window). The 008/06 date-type code selects the
    expansion:

    - d/i/k/q (and m, whose extra raw2 != '9999' guard is already implied
      by date2's '9999' exclusion): start, end, and every year between
    - c (continuing): start, and when raw date2 is the open-range '9999',
      every year through the current year
    - p/r/t: start and end only
    - e/s/u/b/n/| and anything else: start only

    When the 008 yields nothing, falls back to a year extracted from each
    260c value (DateUtils.getYearFromString -> cleaning.extract_year_expr).
    Returns a sorted-ascending array<string> of distinct years (the
    reference returns an unordered Set; sorting makes output deterministic).
    ``current_year`` is injected for determinism (SURVEY.md §2.9 datestamp
    discipline). Pure Column logic — sequence()/transform() keep the year
    expansion JVM-side.
    """
    c008 = F.coalesce(
        F.col(f008) if isinstance(f008, str) else f008, F.lit("")
    )
    vals260c = F.coalesce(
        F.col(f260c_vals) if isinstance(f260c_vals, str) else f260c_vals,
        F.array().cast("array<string>"),
    )
    ok = F.length(c008) >= 15
    c6 = F.substring(c008, 7, 1)
    raw1 = F.substring(c008, 8, 4)
    raw2 = F.substring(c008, 12, 4)

    def get3or4(raw: Column, repl: str) -> Column:
        dddd = raw.rlike("^[0-9]{4}$") & (raw != "9999")
        dddu = raw.rlike("^[0-9]{3}u$")
        first3 = F.substring(raw, 1, 3)
        cand = F.when(dddd, raw).when(
            dddu & (first3.cast("int") <= current_year // 10),
            F.concat(first3, F.lit(repl)),
        )
        y = cand.cast("int")
        return F.when((y >= 500) & (y <= current_year + 1), cand)

    d1 = get3or4(raw1, "0")
    d2 = get3or4(raw2, "9")
    y1 = d1.cast("int")
    y2 = d2.cast("int")

    empty = F.array().cast("array<string>")

    def arr(c: Column) -> Column:
        return F.when(c.isNotNull(), F.array(c)).otherwise(empty)

    def years(lo: Column, hi: Column) -> Column:
        # ascending guard: Spark's sequence() auto-steps -1 when lo > hi,
        # but the reference's for-loop emits nothing in that case
        return F.when(
            lo.isNotNull() & hi.isNotNull() & (lo <= hi),
            F.transform(F.sequence(lo, hi), lambda y: y.cast("string")),
        ).otherwise(empty)

    between = years(y1, y2 - 1)
    branch = (
        F.when(
            c6.isin("d", "i", "k", "q", "m"),
            F.concat(arr(d1), arr(d2), between),
        )
        .when(
            c6 == "c",
            F.concat(
                arr(d1),
                F.when(
                    (raw2 == "9999") & d1.isNotNull(),
                    years(y1, F.lit(current_year)),
                ).otherwise(empty),
            ),
        )
        .when(c6.isin("p", "r", "t"), F.concat(arr(d1), arr(d2)))
        .otherwise(arr(d1))
    )
    from_008 = F.when(ok, branch).otherwise(empty)

    from .cleaning import extract_year_expr

    from_260c = F.filter(
        F.transform(
            vals260c,
            lambda v: F.when(
                extract_year_expr(v).isNotNull(),
                extract_year_expr(v).cast("string"),
            ),
        ),
        lambda y: y.isNotNull(),
    )
    return F.array_sort(
        F.array_distinct(
            F.when(F.size(from_008) > 0, from_008).otherwise(from_260c)
        )
    )


# ---------------------------------------------------------------------------
# Language splitting — smushed 041a split into 3-char codes
# (StanfordIndexer.java:340-357)
# ---------------------------------------------------------------------------


def split_lang_codes_expr(col: str | Column) -> Column:
    """'engfreger' -> [eng, fre, ger]; non-multiple-of-3 values pass through
    whole (the reference logs and keeps them). Accepts a Column so it can
    run inside array lambdas (the profile compiler's getLanguages)."""
    c = col if isinstance(col, Column) else F.col(col)
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


# ---------------------------------------------------------------------------
# Collection gate — getMusicRecords (StanfordIndexer.java:229-250)
# ---------------------------------------------------------------------------

_MUSIC_FORMATS = ("Music - Score", "Music - Recording", "Sound Recording")


def music_collection_expr(format_col: str, callnums_col: str) -> Column:
    """The composed collection gate: 'music' when the record's format is a
    music format, OR it is a Book with any LC call number whose class
    letters are exactly 'M' (StanfordIndexer.getMusicRecords,
    StanfordIndexer.java:229-250 — the required ``collection`` field,
    prof_index.properties:4). ``callnums_col`` is an array<string> of the
    record's item call numbers; null when the gate does not match (the
    reference returns null to drop the record from the collection)."""
    fmt = F.col(format_col)
    is_music_fmt = fmt.isin(*_MUSIC_FORMATS)
    has_m_callnum = F.exists(
        F.coalesce(F.col(callnums_col), F.array().cast("array<string>")),
        lambda c: F.regexp_extract(F.upper(F.trim(c)),
                                   r"^([A-Z]+)", 1) == "M",
    )
    return F.when(
        is_music_fmt | ((fmt == "Book") & has_m_callnum), F.lit("music")
    ).otherwise(F.lit(None).cast("string"))
