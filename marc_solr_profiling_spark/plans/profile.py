"""The reference's whole-index entry point: compile a ``prof_index.properties``
spec into one Spark projection.

The reference is driven end-to-end by a declarative properties file
(``profiling/prof_index.properties``, 227 lines -> ~200 Solr fields): each
line is ``solr_field = tagspec-or-custom-method[, translation_map]``, parsed
by ``SolrIndexer.fillMapFromProperties`` (core/src/org/solrmarc/index/
SolrIndexer.java:152-324) and evaluated per record. A user of the reference
"runs the engine" by feeding exactly this file in; this module lets them feed
the SAME file to Spark:

    fields   = parse_index_properties(open("prof_index.properties").read())
    profiled = profile_frame(marc_df, fields, current_year=2026)

Spark shape (the 100 TB story): the ENTIRE spec compiles into a single
``select`` of pure Column expressions over the MARC-shaped frame — one
codegen'd Project, zero shuffles, zero Python. Record-shared state that the
reference computes once per record in ``perRecordInit``
(StanfordIndexer.java:129-185: cf008, the item set, formats, lcCallnums,
buildings) becomes staged columns computed once and referenced by every
dependent field, so Catalyst's common-subexpression handling mirrors the
reference's per-record memoization. ``customDeleteRecordIfFieldEmpty``
becomes a ``filter`` BEFORE the wide projection, so the gate prunes rows
ahead of all other field work.

Spec value grammar (prof_index.properties:1-227):

    id = custom, getId
    collection = customDeleteRecordIfFieldEmpty, getMusicRecords
    building = custom, getBuildings, library_map.properties
    f024_0a_sim = custom, get024(0, a)
    f041_sim = custom, getAllAlphaSubfields(041)
    leader_byte_06_si = 000[06]
    f008_35-37_si = 008[35-37]
    f7xxi_sim = 700i:710i:...          (colon alternatives)
    f600abcdejq_sim = 600abcdejq       (plain tag+codes)

Field cardinality follows the Solr dynamic-field suffix
(profiling/solr/conf/schema.xml:19-39): ``*_si/_ssi/_ss/_ssort`` ->
single-valued (first extracted value), ``*_sim/_ssim/_ssm/_itsim/...`` ->
multi-valued (array<string>).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable, Dict, List, Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType

from ..functions.domain import pub_date_slider_expr, split_lang_codes_expr
from ..functions.remap import remap_expr, remap_multi_expr
from ..functions.translation_data import TRANSLATION_MAPS
from ..operators.fieldspec import (
    all_alpha_subfields_expr,
    field_list_expr,
    indicator_filtered_values_expr,
)

# ---------------------------------------------------------------------------
# Spec parsing
# ---------------------------------------------------------------------------

#: name suffixes that the schema declares multiValued
#: (profiling/solr/conf/schema.xml:20,22,24,28,30,32,35,37,39)
_MULTI_SUFFIXES = (
    "_sim", "_ssm", "_ssim", "_tim", "_tsm", "_tsim",
    "_itim", "_itsm", "_itsim",
)

#: explicitly-declared multiValued fields (schema.xml:13-17)
_MULTI_NAMES = frozenset(
    {"format", "building", "language", "lc_alpha_facet", "lc_b4cutter_facet"}
)

_CUSTOM_VALUE_RE = re.compile(
    r"^(?P<method>\w+)\s*"
    r"(?:\(\s*(?P<args>[^)]*)\s*\))?\s*"
    r"(?:,\s*(?P<map>\S+?\.properties))?\s*$"
)


@dataclass(frozen=True)
class ProfileField:
    """One ``solr_field = spec`` line of a prof_index-style properties file."""

    name: str
    raw: str
    handler: str  # "spec" | "custom" | "custom_delete_if_empty"
    method: Optional[str] = None
    args: tuple = ()
    map_name: Optional[str] = None
    spec_text: str = ""  # the DSL tagspec, for handler == "spec"

    @property
    def multivalued(self) -> bool:
        return self.name in _MULTI_NAMES or self.name.endswith(
            _MULTI_SUFFIXES
        )


def parse_index_properties(text: str) -> List[ProfileField]:
    """Parse a prof_index.properties-style spec (SolrIndexer.
    fillMapFromProperties, SolrIndexer.java:152-324): ``#`` comments and
    blank lines skipped, first ``=`` splits name from value, ``custom`` /
    ``customDeleteRecordIfFieldEmpty`` dispatch with optional ``(args)``
    and optional trailing translation-map file."""
    fields: List[ProfileField] = []
    for lineno, line in enumerate(text.splitlines(), 1):
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        name, _, value = line.partition("=")
        name, value = name.strip(), value.strip()
        if not name or not value:
            continue
        head, _, rest = value.partition(",")
        head = head.strip()
        if head in ("custom", "customDeleteRecordIfFieldEmpty"):
            m = _CUSTOM_VALUE_RE.match(rest.strip())
            if not m:
                raise ValueError(
                    f"line {lineno}: unparseable custom spec {value!r}"
                )
            args = tuple(
                a.strip() for a in (m.group("args") or "").split(",")
                if a.strip()
            )
            fields.append(
                ProfileField(
                    name=name,
                    raw=value,
                    handler=(
                        "custom" if head == "custom"
                        else "custom_delete_if_empty"
                    ),
                    method=m.group("method"),
                    args=args,
                    map_name=_strip_map(m.group("map")),
                )
            )
        else:
            # plain DSL spec, possibly with a trailing translation map
            map_name = None
            spec = value
            if rest and rest.strip().endswith(".properties"):
                spec, map_name = head, _strip_map(rest.strip())
            fields.append(
                ProfileField(name=name, raw=value, handler="spec",
                             spec_text=spec, map_name=map_name)
            )
    return fields


def _strip_map(map_file: Optional[str]) -> Optional[str]:
    if not map_file:
        return None
    return map_file.rsplit("/", 1)[-1].removesuffix(".properties")


# ---------------------------------------------------------------------------
# Per-record staged state (the perRecordInit analog)
# ---------------------------------------------------------------------------

_SKIPPED_LOCS = TRANSLATION_MAPS["profiling/locations_skipped_list"]
_MISSING_LOCS = TRANSLATION_MAPS["profiling/locations_missing_list"]
_SHELBY_LOCS = TRANSLATION_MAPS["profiling/locations_shelby_list"]
_BIZ_SHELBY_LOCS = TRANSLATION_MAPS["profiling/locations_biz_shelby_list"]
_SKIPPED_CALLNUMS = TRANSLATION_MAPS["profiling/callnums_skipped_list"]

#: LC call numbers cannot start with I, O, W, X, or Y
#: (core/src/org/solrmarc/tools/CallNumUtils.java:54 + isValidLC)
_LC_VALID_RE = r"^[A-HJ-NP-VZ][A-Z]{0,2} ?[0-9]"

_ITEM_SCHEMA = (
    "array<struct<callnum:string,scheme:string,library:string,"
    "home_loc:string,curr_loc:string,item_type:string>>"
)


def items_expr(datafields: str = "datafields") -> Column:
    """The record's item set from its 999 fields (Item.java:81-87: $a
    callnum, $w scheme, $m library, $l home loc, $k current loc, $t type),
    excluding items the reference never admits to the set: skipped
    locations and the EDI-REMOVE type (Item.java:89-94)."""

    def sub(f: Column, code: str) -> Column:
        vals = F.filter(
            f["subfields"],
            lambda s: (s["code"] == code) & s["value"].isNotNull(),
        )
        return F.coalesce(
            F.trim(F.try_element_at(F.transform(vals, lambda s: s["value"]), F.lit(1))),
            F.lit(""),
        )

    skipped = sorted(_SKIPPED_LOCS)
    raw = F.transform(
        F.filter(F.col(datafields), lambda f: f["tag"] == "999"),
        lambda f: F.struct(
            sub(f, "a").alias("callnum"),
            sub(f, "w").alias("scheme"),
            sub(f, "m").alias("library"),
            sub(f, "l").alias("home_loc"),
            sub(f, "k").alias("curr_loc"),
            sub(f, "t").alias("item_type"),
        ),
    )
    def admit(it: Column) -> Column:
        cond = it["item_type"] != "EDI-REMOVE"
        if skipped:
            cond = cond & ~it["home_loc"].isin(*skipped) \
                & ~it["curr_loc"].isin(*skipped)
        return cond

    return F.filter(raw, admit).cast(_ITEM_SCHEMA)


def lc_callnums_expr(items: Column) -> Column:
    """LC call numbers admitted to ``lcCallnums`` (StanfordIndexer.java:
    176-182 + CallNumUtils.getLCcallnums, profiling/CallNumUtils.java:
    426-455): LC-scheme items (scheme startswith 'LC', Item.java:506-508)
    that are not shelby-located, not missing/lost, and whose call number is
    not on the ignored list (skipped-callnums list, 'INTERNET RESOURCE',
    'XX' temporary prefix — Item.java:123-128), kept only when they pass
    the LC validity gate (isValidLC — class letters cannot start I/O/W/X/Y,
    must reach digits)."""
    shelby = sorted(_SHELBY_LOCS | _BIZ_SHELBY_LOCS)
    missing = sorted(_MISSING_LOCS)
    skipped_cn = sorted(_SKIPPED_CALLNUMS)

    def bad_loc(it: Column) -> Column:
        cond = F.lit(False)
        if shelby:
            cond = cond | it["home_loc"].isin(*shelby) \
                | it["curr_loc"].isin(*shelby)
        if missing:
            cond = cond | it["home_loc"].isin(*missing) \
                | it["curr_loc"].isin(*missing)
        return cond

    def ignored_cn(it: Column) -> Column:
        cond = it["callnum"].startswith("INTERNET RESOURCE") | it[
            "callnum"
        ].startswith("XX")
        if skipped_cn:
            cond = cond | it["callnum"].isin(*skipped_cn)
        return cond

    lc = F.filter(
        items,
        lambda it: it["scheme"].startswith("LC")
        & ~bad_loc(it)
        & ~ignored_cn(it)
        & it["callnum"].rlike(_LC_VALID_RE),
    )
    return F.array_distinct(F.transform(lc, lambda it: it["callnum"]))


def formats_set_expr(
    leader: str = "leader",
    controlfields: str = "controlfields",
    datafields: str = "datafields",
    items: Optional[Column] = None,
) -> Column:
    """The record's FORMAT SET (StanfordIndexer.setFormats,
    StanfordIndexer.java:272-330): leader/008 base classification with the
    serial fallback (FormatUtils.getFormatsPerLdrAnd008 / getSerialFormat),
    then the additive refinements —

    - any 6xx $x/$v containing 'congresses' removes Journal/Periodical and
      adds Conference Proceedings (:289-302)
    - 999 OTHER-scheme call numbers starting MFILM/MFICHE -> Microformat,
      MCD -> Music - Recording, ZDVD/ADVD -> Video; item type DATABASE ->
      Database (:304-318)
    - a 245 $h containing 'microform' -> Microformat
      (FormatUtils.isMicroformat, FormatUtils.java:205-211)
    - a 502 field -> Thesis (FormatUtils.isThesis, :218-223)
    - still empty -> Other (:327-329)

    Returns array<string> of distinct format names (enumValues/Format.java
    toString values)."""
    t = F.substring(F.col(leader), 7, 1)
    lvl = F.substring(F.col(leader), 8, 1)

    def cf(tag: str) -> Column:
        vals = F.filter(F.col(controlfields), lambda c: c["tag"] == tag)
        return F.try_element_at(F.transform(vals, lambda c: c["data"]), F.lit(1))

    c008 = F.coalesce(cf("008"), F.lit(""))
    c006 = F.coalesce(cf("006"), F.lit(""))
    b21 = F.substring(c008, 22, 1)
    b26 = F.substring(c008, 27, 1)
    b33 = F.substring(c008, 34, 1)

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

    def serial_from(ch: Column) -> Column:
        return (
            F.when(ch == "m", "Book")
            .when(ch == "n", "Newspaper")
            .when(ch.isin("p", " "), "Journal/Periodical")
            .otherwise(F.lit(None).cast("string"))
        )

    serial = F.when(
        base.isNull() & (lvl == "s"), serial_from(b21)
    ).otherwise(F.lit(None).cast("string"))
    serial = F.coalesce(
        serial,
        F.when(
            base.isNull() & (F.substring(c006, 1, 1) == "s"),
            serial_from(F.substring(c006, 5, 1)),
        ),
    )
    first = F.coalesce(base, serial)
    core = F.when(first.isNotNull(), F.array(first)).otherwise(
        F.array().cast("array<string>")
    )

    congress = F.exists(
        F.col(datafields),
        lambda f: f["tag"].startswith("6")
        & F.exists(
            f["subfields"],
            lambda s: s["code"].isin("x", "v")
            & F.lower(F.coalesce(s["value"], F.lit(""))).contains(
                "congresses"
            ),
        ),
    )
    core = F.when(
        congress,
        F.concat(
            F.filter(core, lambda v: v != "Journal/Periodical"),
            F.array(F.lit("Conference Proceedings")),
        ),
    ).otherwise(core)

    additions = []
    if items is not None:
        # OTHER-scheme = anything but the recognized schemes
        # (Item.assignCallnumType, Item.java:506-520)
        other_items = F.filter(
            items,
            lambda it: ~(
                it["scheme"].startswith("LC")
                | it["scheme"].startswith("DEWEY")
                | (it["scheme"] == "SUDOC")
                | (it["scheme"] == "ALPHANUM")
            ),
        )

        def any_prefix(*prefixes: str) -> Column:
            return F.exists(
                other_items,
                lambda it: F.lit(False)
                if not prefixes
                else _any([it["callnum"].startswith(p) for p in prefixes]),
            )

        additions.extend(
            [
                F.when(any_prefix("MFILM", "MFICHE"), "Microformat"),
                F.when(any_prefix("MCD"), "Music - Recording"),
                F.when(any_prefix("ZDVD", "ADVD"), "Video"),
                F.when(
                    F.exists(
                        items,
                        lambda it: F.upper(it["item_type"]) == "DATABASE",
                    ),
                    "Database",
                ),
            ]
        )
    micro = F.exists(
        F.col(datafields),
        lambda f: (f["tag"] == "245")
        & F.exists(
            f["subfields"],
            lambda s: (s["code"] == "h")
            & F.lower(F.coalesce(s["value"], F.lit(""))).contains(
                "microform"
            ),
        ),
    )
    thesis = F.exists(F.col(datafields), lambda f: f["tag"] == "502")
    additions.append(F.when(micro, "Microformat"))
    additions.append(F.when(thesis, "Thesis"))

    with_adds = F.concat(
        core, F.filter(F.array(*additions), lambda v: v.isNotNull())
    )
    out = F.array_distinct(with_adds)
    return F.when(F.size(out) == 0, F.array(F.lit("Other"))).otherwise(out)


def _any(conds: Sequence[Column]) -> Column:
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out


# ---------------------------------------------------------------------------
# Custom-method dispatch
# ---------------------------------------------------------------------------

# staged column names shared across custom methods
_ST_ITEMS = "__prof_items"
_ST_LC = "__prof_lc_callnums"
_ST_FORMATS = "__prof_formats"


def _m_get_id(fld, ctx) -> Column:
    """setId (StanfordIndexer.java:202-212): 001 data with a leading 'a'
    stripped; null when the 001 does not start with 'a'."""
    c001 = F.try_element_at(field_list_expr("001"), F.lit(1))
    return F.when(c001.startswith("a"), c001.substr(F.lit(2), F.length(c001)))


def _m_get_formats(fld, ctx) -> Column:
    return F.col(_ST_FORMATS)


def _m_get_music_records(fld, ctx) -> Column:
    """getMusicRecords (StanfordIndexer.java:229-250): 'music' when the
    format set holds a music format, or holds Book and any admitted LC
    call number outside LANE-MED has class letters exactly 'M'."""
    fmts = F.col(_ST_FORMATS)
    is_music = F.arrays_overlap(
        fmts,
        F.array(
            F.lit("Music - Score"),
            F.lit("Music - Recording"),
            F.lit("Sound Recording"),
        ),
    )
    m_item = F.exists(
        F.col(_ST_ITEMS),
        lambda it: it["scheme"].startswith("LC")
        & (it["library"] != "LANE-MED")
        & it["callnum"].rlike(_LC_VALID_RE)
        & (F.regexp_extract(it["callnum"], r"^([A-Z]+)", 1) == "M"),
    )
    has_book = F.array_contains(fmts, "Book")
    return F.when(is_music | (has_book & m_item), F.lit("music"))


def _m_get_buildings(fld, ctx) -> Column:
    """setBuildings (StanfordIndexer.java:1228-1244): each admitted item's
    non-empty library code."""
    libs = F.transform(F.col(_ST_ITEMS), lambda it: it["library"])
    return F.array_distinct(F.filter(libs, lambda b: b != ""))


def _m_get_languages(fld, ctx) -> Column:
    """getLanguages (StanfordIndexer.java:340-365): 008[35-37] + 041 d/e/j,
    plus 041a values split into 3-char codes when their length is a
    multiple of 3 (non-multiples are dropped, per the reference's missing
    else branch)."""
    base = field_list_expr("008[35-37]:041d:041e:041j")
    a041 = field_list_expr("041a")
    split = F.flatten(
        F.transform(
            a041,
            lambda v: F.when(
                (F.length(v) % 3) == 0, split_lang_codes_expr(v)
            ).otherwise(F.array().cast("array<string>")),
        )
    )
    return F.array_distinct(F.concat(base, split))


def _m_get024(fld, ctx) -> Column:
    ind1, codes = fld.args
    return indicator_filtered_values_expr("024", ind1, codes)


def _m_get_all_alpha(fld, ctx) -> Column:
    (tag,) = fld.args
    return all_alpha_subfields_expr(tag)


def _m_lc_callnum_cats(fld, ctx) -> Column:
    """getLCCallNumCats (StanfordIndexer.java:1375-1384): the class letters
    of each admitted LC call number."""
    letters = F.transform(
        F.col(_ST_LC),
        lambda c: F.regexp_extract(c, r"^([A-Z]+)", 1),
    )
    return F.array_distinct(F.filter(letters, lambda x: x != ""))


def _m_lc_b4cutter(fld, ctx) -> Column:
    """getLCCallNumsB4Cutter (StanfordIndexer.java:1392-1398): the portion
    before the first cutter of each admitted LC call number."""
    vals = F.transform(F.col(_ST_LC), lambda c: _b4cutter_of(c))
    return F.array_distinct(
        F.filter(vals, lambda x: x.isNotNull() & (x != ""))
    )


def _b4cutter_of(c: Column) -> Column:
    # getPortionBeforeCutter (core CallNumUtils.java:194-209): the piece
    # before the first run of spaces, '.<capital>' cutter start, or slash
    return F.trim(F.try_element_at(F.split(c, r"(?: +|\.[A-Z]| */)"), F.lit(1)))


def _m_pub_date_slider(fld, ctx) -> Column:
    vals260c = field_list_expr("260c")
    c008 = F.try_element_at(field_list_expr("008"), F.lit(1))
    return pub_date_slider_expr(c008, vals260c, ctx["current_year"])


def _m_pub_date_data(fld, ctx) -> Dict[str, Column]:
    """Map-returning custom method: ONE method emitting SEVERAL output
    columns at once (SolrIndexer.finishCustomMethod, SolrIndexer.java:
    875-903 — when ``returnType.isAssignableFrom(Map.class)``, the map's
    KEYS name the solr fields and the spec line's own field name is a
    dummy).  The Spark analog returns ``{output_name: Column}``; the
    compiler expands each entry into its own projected column.

    This built-in example derives the slider year set and its sortable
    minimum in one compiled method."""
    vals260c = field_list_expr("260c")
    c008 = F.try_element_at(field_list_expr("008"), F.lit(1))
    slider = pub_date_slider_expr(c008, vals260c, ctx["current_year"])
    return {
        "pub_year_itsim": slider,
        "pub_date_sort": F.array_min(slider),
    }


_m_pub_date_data.returns_map = True  # type: ignore[attr-defined]


_DISPATCH: Dict[str, Callable] = {
    "getId": _m_get_id,
    "getFormats": _m_get_formats,
    "getMusicRecords": _m_get_music_records,
    "getBuildings": _m_get_buildings,
    "getLanguages": _m_get_languages,
    "get024": _m_get024,
    "getAllAlphaSubfields": _m_get_all_alpha,
    "getLCCallNumCats": _m_lc_callnum_cats,
    "getLCCallNumsB4Cutter": _m_lc_b4cutter,
    "getPubDateSliderVals": _m_pub_date_slider,
    "getPubDateData": _m_pub_date_data,
}


def register_custom_method(name: str, fn: Callable, *,
                           returns_map: bool = False) -> None:
    """Register a user custom method for the profile compiler — the analog
    of dropping a custom method on SolrIndexer's classpath
    (SolrIndexer.java:760-814 reflective dispatch).  ``fn(fld, ctx)`` must
    return a Column, or a ``{output_name: Column}`` dict when
    ``returns_map`` (SolrIndexer.java:880-884 Map-return semantics)."""
    if returns_map:
        fn.returns_map = True  # type: ignore[attr-defined]
    _DISPATCH[name] = fn


def _returns_map(method: Optional[str]) -> bool:
    fn = _DISPATCH.get(method or "")
    return bool(getattr(fn, "returns_map", False))


def map_field_columns(fld: ProfileField, ctx: Mapping) -> Dict[str, Column]:
    """Compile a map-returning custom method to its named Columns.
    Translation maps do NOT apply to Map returns (SolrIndexer.java:880-884
    puts the map straight into indexMap with no remap, unlike the
    Set/String branches at :886-902); the method controls value shapes."""
    fn = _DISPATCH.get(fld.method or "")
    if fn is None or not getattr(fn, "returns_map", False):
        raise NotImplementedError(
            f"custom method {fld.method!r} is not a registered "
            "map-returning method"
        )
    out = fn(fld, ctx)
    if not isinstance(out, dict):
        raise TypeError(
            f"map-returning method {fld.method!r} must return a dict of "
            f"Columns, got {type(out).__name__}"
        )
    return out


def _resolve_map(map_name: str) -> Mapping[str, str]:
    for prefix in ("profiling/", "core/"):
        key = prefix + map_name
        if key in TRANSLATION_MAPS:
            m = TRANSLATION_MAPS[key]
            if isinstance(m, Mapping):
                return m
    raise KeyError(f"unknown translation map: {map_name}")


# ---------------------------------------------------------------------------
# The compiler
# ---------------------------------------------------------------------------


def field_column(fld: ProfileField, ctx: Mapping) -> Column:
    """Compile one spec line to a Column (array<string> for multi-valued
    names, string for single-valued — schema.xml:19-39 suffixes)."""
    if fld.handler == "spec":
        col = field_list_expr(getattr(fld, "spec_text", fld.raw))
    else:
        fn = _DISPATCH.get(fld.method or "")
        if fn is None:
            raise NotImplementedError(
                f"custom method {fld.method!r} has no Spark dispatch"
            )
        if getattr(fn, "returns_map", False):
            raise TypeError(
                f"custom method {fld.method!r} returns a Map — use "
                "map_field_columns / profile_frame, which expand it into "
                "one column per map key"
            )
        col = fn(fld, ctx)
    # translation map (third comma part): Set-valued remap drops unmapped
    # values (Utils.java:394-424); scalar remap maps-or-drops
    # set-valued unless the method is one of the two scalar custom methods
    scalar_methods = ("getId", "getMusicRecords")
    produces_scalar = fld.handler != "spec" and fld.method in scalar_methods
    if fld.map_name:
        mapping = _resolve_map(fld.map_name)
        if produces_scalar:
            col = remap_expr(col, mapping)
        else:
            # Set-valued remap drops unmapped values (Utils.java:394-424)
            col = remap_multi_expr(col, mapping)
    if fld.multivalued:
        if produces_scalar:
            col = F.when(col.isNotNull(), F.array(col)).otherwise(
                F.array().cast("array<string>")
            )
    else:
        if not produces_scalar:
            col = F.try_element_at(col, F.lit(1))
    return col


def profile_frame(
    df: DataFrame,
    fields: Sequence[ProfileField],
    *,
    current_year: int,
    id_col: str = "record_id",
) -> DataFrame:
    """Evaluate a parsed spec over a MARC-shaped frame: one wide SELECT.

    Stages the perRecordInit state (items / lcCallnums / formats) as
    columns first, applies every ``customDeleteRecordIfFieldEmpty`` gate as
    a filter, then projects every field. The result carries ``id_col``
    plus one column per spec line, in file order."""
    ctx = {"current_year": current_year}
    items = items_expr()
    staged = df.withColumn(_ST_ITEMS, items).withColumn(
        _ST_LC, lc_callnums_expr(F.col(_ST_ITEMS))
    ).withColumn(
        _ST_FORMATS, formats_set_expr(items=F.col(_ST_ITEMS))
    )
    def _nonempty(col: Column) -> Column:
        # type-aware "has a value" test (analysis-time only, no job): empty
        # arrays count as empty, like Set.size()==0 in finishCustomMethod
        dt = staged.select(col.alias("_g")).schema[0].dataType
        if isinstance(dt, ArrayType):
            return F.size(F.coalesce(col, F.array().cast(dt))) > 0
        return col.isNotNull()

    # record-dropping gates run before the wide projection
    for fld in fields:
        if fld.handler == "custom_delete_if_empty":
            base = ProfileField(
                name=fld.name, raw=fld.raw, handler="custom",
                method=fld.method, args=fld.args, map_name=fld.map_name,
            )
            if _returns_map(fld.method):
                # Map return + deleteIfEmpty: drop when the map is empty
                # (SolrIndexer.java:882-883) — columnar analog: every
                # emitted value empty/null
                vals = map_field_columns(base, ctx).values()
                staged = staged.filter(
                    _any([_nonempty(v) for v in vals])
                )
                continue
            gate = field_column(base, ctx)
            if fld.multivalued:
                staged = staged.filter(F.size(F.coalesce(
                    gate, F.array().cast("array<string>"))) > 0)
            else:
                staged = staged.filter(gate.isNotNull())
    cols = [F.col(id_col)]
    for fld in fields:
        base = fld if fld.handler != "custom_delete_if_empty" else (
            ProfileField(
                name=fld.name, raw=fld.raw, handler="custom",
                method=fld.method, args=fld.args, map_name=fld.map_name,
            )
        )
        if base.handler != "spec" and _returns_map(base.method):
            # the map's keys name the output columns; the spec line's own
            # field name is a dummy (SolrIndexer.java:860-863)
            cols.extend(
                v.alias(k) for k, v in map_field_columns(base, ctx).items()
            )
        else:
            cols.append(field_column(base, ctx).alias(fld.name))
    return staged.select(*cols)


def profile_facets(
    profiled: DataFrame,
    fields: Optional[Sequence[str]] = None,
    *,
    limit: int = 21,
    mincount: int = 1,
    id_col: str = "record_id",
) -> DataFrame:
    """The default search handler's whole-profile facet battery
    (profiling/solr/conf/solrconfig.xml:85-280 lists ~150 facet.field
    entries with facet.mincount=1, facet.limit=21) in ONE pass.

    Scale shape: instead of one scan + shuffle per facet field (what a
    naive loop over facet_counts would do), every field's (field, value)
    pairs are emitted from a single generator expression and exploded once
    — one scan, one shuffle keyed on (field, value), then a per-field
    top-``limit`` window on the (tiny) counted side. Multi-valued fields
    contribute one pair per array element, matching Solr's per-value
    faceting of multiValued fields.

    Output: (facet_field, facet_value, count, rank), ordered by field then
    rank; ties broken by value ascending for determinism.
    """
    names = [c for c in (fields or profiled.columns) if c != id_col]
    pair_arrays = []
    for name in names:
        dt = profiled.schema[name].dataType.typeName()
        if dt == "array":
            # NB: the lambda must be single-argument — a second (defaulted)
            # parameter makes pyspark pass the element INDEX into it
            def pair_of(n):
                return lambda v: F.struct(
                    F.lit(n).alias("facet_field"),
                    v.cast("string").alias("facet_value"),
                )

            pair_arrays.append(
                F.transform(
                    F.coalesce(
                        F.col(name), F.array().cast("array<string>")
                    ),
                    pair_of(name),
                )
            )
        else:
            pair_arrays.append(
                F.when(
                    F.col(name).isNotNull(),
                    F.array(
                        F.struct(
                            F.lit(name).alias("facet_field"),
                            F.col(name).cast("string").alias("facet_value"),
                        )
                    ),
                ).otherwise(
                    F.array().cast(
                        "array<struct<facet_field:string,facet_value:string>>"
                    )
                )
            )
    pairs = profiled.select(
        F.explode(F.concat(*pair_arrays)).alias("p")
    ).select("p.facet_field", "p.facet_value")
    counted = (
        pairs.filter(F.col("facet_value").isNotNull())
        .groupBy("facet_field", "facet_value")
        .agg(F.count("*").alias("count"))
        .filter(F.col("count") >= mincount)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("facet_field").orderBy(
        F.desc("count"), F.asc("facet_value")
    )
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= limit)
        .orderBy("facet_field", "rank")
    )
