"""GetFormatMixin content/media taxonomy — the reference's richer format
classifier (core/src/org/solrmarc/index/GetFormatMixin.java:210-2078),
re-expressed as pure Catalyst column expressions.

The mixin derives, per record:

- CONTENT types (GetFormatMixin.getContentTypes, :312-825): leader/06(+07)
  picks a (default type, profile); the profile selects which byte of the
  008 (and of each 006, shifted -7) refines the type via per-profile char
  maps; 502 presence prepends Thesis (and suppresses Manuscript); an empty
  result falls back to 020-presence -> Book, else the leader type.
- MEDIA types (getMediaTypes, :827-1660): 245$h "[electronic resource]";
  each post-1981 007 via nested (byte0, byte1[, byte3/4]) char maps; the
  008/006 form-of-item byte (23 or 29 by profile).
- hasFullText (:2023-2060): the record has fulltext 856 urls
  (MarcUtils.getFullTextUrls ind2/note rules, MarcUtils.java:1526-1554)
  AND at least one 856$u not containing "loc.gov".
- addOnlineTypes (:245-263): online && Book -> EBook prepended; online ->
  Online appended.

All set semantics are LinkedHashSet (insertion-ordered, deduplicated) =
``array_distinct`` over ordered concats. Everything is when/otherwise +
``transform`` over the repeatable 006/007 arrays — zero Python in the hot
path; the char maps are plan-construction data only. The display-name
translation maps for these enums already ship in ``translation_data.py``
(core/getformat_mixin_map, ported r1/r2).

Record shape expected (the profiling wide-row analog):
  leader string, f008 string?, f006s array<string>?, f007s array<string>?,
  title_h string?, has_502 boolean, has_020 boolean,
  f856s array<struct<ind2:string, url:string, note:string>>?
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# char maps (data extracted from the reference's switch statements;
# GetFormatMixin.java line cites per map)
# ---------------------------------------------------------------------------

# leader/06 (or 006/00) -> (default content type, 008-profile)
# (extractTypeProfile, GetFormatMixin.java:1823-2013; 'a'/'t'/'s' handled
# separately — they depend on the source and leader/07)
_RECTYPE = {
    "b": ("Manuscript", ""),
    "c": ("MusicalScore", "music"),
    "d": ("MusicalScoreManuscript", "music"),
    "e": ("Map", "maps"),
    "f": ("MapManuscript", "maps"),
    "g": ("ProjectedMedium", "visual"),
    "h": ("", ""),  # obsolete microform code: physical form, not a type
    "i": ("SoundRecording", "music"),
    "j": ("MusicRecording", "music"),
    "k": ("Image", "visual"),
    "m": ("ComputerFile", "computers"),
    "n": ("SpecialInstructionalMaterial", ""),
    "o": ("Kit", "visual"),
    "p": ("MixedMaterial", "mixed"),
    "r": ("PhysicalObject", "visual"),
}

# leader/07 for language material (leader/06 in {a,t}) -> (type, profile)
# (GetFormatMixin.java:1846-1900)
_LEADER07 = {
    "a": ("BookComponentPart", "books"),
    "b": ("SerialComponentPart", "serial"),
    "c": ("BookCollection", "books"),
    "d": ("BookSubunit", "books"),
    "i": ("SerialIntegratingResource", "serial"),
    "p": ("Pamphlet", ""),
    "m": ("Book", "books"),
    "s": ("Serial", "serial"),
}

# per-profile content refinements; (008 position, char map); 006 uses
# position - 7 (GetFormatMixin.java:394-790)
_CONTENT_COMPUTERS = (26, {
    "a": "ComputerNumericData", "b": "ComputerProgram",
    "c": "ComputerRepresentational", "d": "ComputerDocument",
    "e": "ComputerBibliographicData", "f": "ComputerFont",
    "g": "ComputerGame", "h": "ComputerSound",
    "i": "ComputerInteractiveMultimedia", "j": "ComputerOnlineSystem",
    "m": "ComputerCombination",
})
_CONTENT_MAPS = (25, {
    "a": "MapSingle", "b": "MapSeries", "c": "MapSerial", "d": "Globe",
    "e": "Atlas", "f": "MapSeparate", "g": "MapBound",
})
_CONTENT_SERIAL = (21, {
    "d": "Database", "l": "LooseLeaf", "m": "BookSeries", "n": "Newspaper",
    "p": "Periodical", "w": "Website",
})
_CONTENT_VISUAL = (33, {
    "a": "Art", "b": "Kit", "c": "ArtReproduction", "d": "Diorama",
    "f": "Filmstrip", "g": "Game", "i": "Picture", "k": "Graphic",
    "l": "TechnicalDrawing", "m": "MotionPicture", "n": "Chart",
    "o": "FlashCard", "p": "MicroscopeSlide", "q": "Model", "r": "Realia",
    "s": "Slide", "t": "Transparency", "v": "Video", "w": "Toy",
})

# 007 media maps: byte0 -> (byte1 char map, default)
# (getMediaTypes, GetFormatMixin.java:871-1450)
_MEDIA_007 = {
    "a": ({"d": "Atlas", "g": "MapDiagram", "j": "Map", "k": "MapProfile",
           "q": "MapModel", "r": "SensorImage", "s": "MapSection",
           "y": "MapView"}, "MapOther"),
    "c": ({"a": "ComputerTapeCartridge", "b": "ComputerChipCartridge",
           "c": "ComputerOpticalDiscCartridge", "d": "ComputerDisk",
           "e": "ComputerDiscCartridge", "f": "ComputerTapeCassette",
           "h": "ComputerTapeReel", "j": "ComputerFloppyDisk",
           "k": "ComputerCard", "m": "ComputerMagnetoOpticalDisc",
           "o": "ComputerOpticalDisc", "r": "Online"}, "ComputerOther"),
    "d": ({"a": "GlobeCelestial", "b": "GlobePlanetary",
           "c": "GlobeTerrestrial", "e": "GlobeEarthMoon"}, "GlobeOther"),
    "f": ({"a": "TactileMoon", "b": "Braille", "c": "TactileCombination",
           "d": "TactileNoWritingSystem"}, "TactileOther"),
    "g": ({"c": "FilmstripCartridge", "d": "Filmslip", "f": "Filmstrip",
           "o": "FilmstripRoll", "s": "Slide", "t": "Transparency"},
          "ProjectedMediumOther"),
    "h": ({"a": "MicroformApetureCard", "b": "MicrofilmCartridge",
           "c": "MicrofilmCassette", "d": "MicrofilmReel",
           "e": "Microfiche", "f": "MicroficheCassette", "g": "Microopaque",
           "h": "MicrofilmSlip", "j": "MicrofilmRoll"}, "Microform"),
    "k": ({"a": "ActivityCard", "c": "Collage", "d": "Drawing",
           "e": "Painting", "f": "PhotomechanicalPrint",
           "g": "Photonegative", "h": "PhotoPrint", "i": "Picture",
           "j": "ImagePrint", "k": "Poster", "l": "Drawing", "n": "Chart",
           "o": "FlashCard", "p": "Postcard", "q": "Icon",
           "r": "Radiograph", "s": "StudyPrint", "v": "Photo"},
          "ImageOther"),
    "m": ({"c": "FilmstripCartridge", "f": "FilmCassette",
           "o": "FilmstripRoll", "r": "Filmstrip"}, "FilmOther"),
}
_MEDIA_007_FLAT = {"o": "Kit", "q": "MusicalScore", "r": "SensorImage"}
_MEDIA_SOUND = ({"c": "SoundCylinder", "e": "SoundCylinder",
                 "g": "SoundCartridge", "f": "SoundTrackFilm",
                 "i": "SoundTrackFilm", "r": "SoundRoll", "q": "SoundRoll",
                 "s": "SoundCassette", "t": "SoundTapeReel",
                 "w": "SoundWireRecording"}, "SoundRecordingOther")
_MEDIA_TEXT = ({"a": "Print", "b": "PrintLarge", "c": "Braille",
                "d": "LooseLeaf"}, "TextOther")
# 007/04 video format (GetFormatMixin.java:1452-1600)
_MEDIA_VIDEO4 = ({"a": "VideoBeta", "b": "VideoVHS", "c": "VideoUMatic",
                  "d": "VideoEIAJ", "e": "VideoTypeC", "f": "VideoQuadruplex",
                  "g": "VideoLaserdisc", "h": "VideoCapacitance",
                  "i": "VideoBetacam", "j": "VideoBetacamSP",
                  "k": "VideoSuperVHS", "m": "VideoMII", "o": "VideoD2",
                  "p": "Video8mm", "q": "VideoHi8", "s": "VideoBluRay",
                  "v": "VideoDVD"}, "VideoOther")
# 007/01 fallback video form (getVideoMediaForm, :1703-1746)
_MEDIA_VIDEO1 = ({"c": "VideoCartridge", "d": "VideoDisc",
                  "f": "VideoCassette", "r": "VideoReel"}, "VideoOther")
# 008/006 form-of-item byte (GetFormatMixin.java:1610-1660); codes not
# listed contribute nothing
_MEDIA_FORM = {
    "a": "Microfilm", "b": "Microfiche", "c": "Microopaque",
    "d": "PrintLarge", "f": "Braille", "o": "Online",
    "q": "ElectronicDirect", "s": "Electronic", "r": "Print",
}


def _switch(ch: Column, mapping: dict, default) -> Column:
    """Char-map lookup as a FOLDABLE literal map: ``create_map`` over
    literals constant-folds to one MapData evaluated once per plan, and
    ``try_element_at`` (NULL on miss, ANSI-safe) compiles to a hash probe
    — versus a 30-branch CaseWhen chain whose generated code grows
    linearly and, summed over the mixin's ~15 maps and their expression-
    level duplication, pushed the whole Project past the huge-method
    limit and out of whole-stage codegen entirely (interpreted per-row —
    the one fallback that cannot be allowed on the 100 TB path).
    ``default`` is a literal string, a Column, or None (-> NULL)."""
    pairs = [F.lit(x) for kv in sorted(mapping.items()) for x in kv]
    got = F.try_element_at(F.create_map(*pairs), ch)
    if default is None:
        return got
    if not isinstance(default, Column):
        default = F.lit(default)
    return F.coalesce(got, default)


def _lchar(col: Column, pos0: int) -> Column:
    """Lowercased char at 0-based ``pos0`` ('' when out of range)."""
    return F.lower(F.substring(col, pos0 + 1, 1))


# ---------------------------------------------------------------------------
# extractTypeProfile (GetFormatMixin.java:1812-2013)
# ---------------------------------------------------------------------------


def _type_profile(field: Column, source: str) -> tuple[Column, Column]:
    """(default content type, profile) from the leader or an 006 payload."""
    rt = _lchar(field, 6 if source == "leader" else 0)
    base_t = _switch(rt, {c: t for c, (t, _) in _RECTYPE.items()}, "")
    base_p = _switch(rt, {c: p for c, (t, p) in _RECTYPE.items()}, "")
    if source == "leader":
        l7 = _lchar(field, 7)
        lang_t = _switch(l7, {c: t for c, (t, _) in _LEADER07.items()}, "")
        lang_p = _switch(l7, {c: p for c, (t, p) in _LEADER07.items()}, "")
        t = F.when(rt.isin("a", "t"), lang_t).otherwise(base_t)
        p = F.when(rt.isin("a", "t"), lang_p).otherwise(base_p)
        # leader source: 's' (serial) is an 006-only code
        return t, p
    # 006 source
    t = (
        F.when(rt == "a", "Book")
        .when(rt == "t", "Manuscript")
        .when(rt == "s", "Serial")
        .otherwise(base_t)
    )
    p = (
        F.when(rt.isin("a", "t"), "books")
        .when(rt == "s", "serial")
        .otherwise(base_p)
    )
    return t, p


# ---------------------------------------------------------------------------
# content types (getContentTypes, GetFormatMixin.java:312-825)
# ---------------------------------------------------------------------------


def _content_from_format_field(
    field: Column, dtype: Column, profile: Column, shift: int
) -> Column:
    """One 008 (shift=0) or 006 (shift=7) field's content-type
    contribution; NULL when the profile is unknown (the reference logs a
    minor error and adds nothing).

    Structured so ``dtype`` appears EXACTLY ONCE: the refinement inner
    CASE yields NULL for (short field | unmatched char | unrefined
    profile) and a single coalesce falls back to ``dtype``. The naive
    shape embedded dtype in 5 branches; for the leader path dtype is a
    ~30-branch tree, so the duplication quintupled the generated code."""

    def refined(spec: tuple) -> Column:
        pos, mapping = spec
        pos -= shift
        # short field (length-1 < pos) -> NULL -> default type
        return F.when(
            F.length(field) > pos, _switch(_lchar(field, pos), mapping, None)
        )

    inner = (
        F.when(profile == "computers", refined(_CONTENT_COMPUTERS))
        .when(profile == "maps", refined(_CONTENT_MAPS))
        .when(profile == "serial", refined(_CONTENT_SERIAL))
        .when(profile == "visual", refined(_CONTENT_VISUAL))
    )  # books/music/mixed -> NULL -> dtype via the coalesce below
    known = profile.isin(
        "books", "music", "mixed", "computers", "maps", "serial", "visual"
    )
    return F.when(known, F.coalesce(inner, dtype))


def _content_raw(ltype: Column, lprofile: Column, c008: Column,
                 sixes: Column) -> Column:
    """008 contribution (leader-derived type/profile) then each 006 (own
    type/profile, positions shifted -7), filtered and deduplicated —
    the pre-thesis/pre-fallback set of getContentTypes."""
    from_008 = F.when(
        c008.isNotNull(),
        _content_from_format_field(c008, ltype, lprofile, 0),
    )

    def per_006(fld: Column) -> Column:
        t6, p6 = _type_profile(fld, "006")
        return _content_from_format_field(fld, t6, p6, 7)

    raw = F.concat(F.array(from_008), F.transform(sixes, per_006))
    return F.array_distinct(
        F.filter(raw, lambda x: x.isNotNull() & (x != ""))
    )


def _content_finish(result: Column, ltype: Column,
                    has_502: Column | None,
                    has_020: Column | None) -> Column:
    """Thesis override + 020/leader-type empty fallback
    (GetFormatMixin.java:795-823). NOTE: ``result`` is embedded three
    times — pass a (cheap) column reference, not a deep tree; the staged
    ``with_mixin_types`` does exactly that."""
    if has_502 is not None:
        # addToTop(Thesis) + remove(Manuscript) (GetFormatMixin.java:795-803)
        result = F.when(
            has_502,
            F.array_distinct(
                F.concat(
                    F.array(F.lit("Thesis")),
                    F.array_remove(result, "Manuscript"),
                )
            ),
        ).otherwise(result)
    fallback = F.when(
        has_020 if has_020 is not None else F.lit(False),
        F.array(F.lit("Book")),
    ).otherwise(
        F.when(ltype != "", F.array(ltype)).otherwise(
            F.array().cast("array<string>")
        )
    )
    return F.when(F.size(result) == 0, fallback).otherwise(result)


def content_types_expr(
    leader: str = "leader",
    f008: str = "f008",
    f006s: str = "f006s",
    has_502: str | None = None,
    has_020: str | None = None,
) -> Column:
    """Ordered deduplicated content types (getContentTypes,
    GetFormatMixin.java:312-825) as ONE column expression. Fine for
    single-record fetches and tests; for a full-corpus pass prefer
    ``with_mixin_types`` — its named-column staging keeps every Project
    small enough for whole-stage codegen."""
    ldr = F.coalesce(F.col(leader), F.lit(""))
    ltype, lprofile = _type_profile(ldr, "leader")
    sixes = F.coalesce(F.col(f006s), F.array().cast("array<string>"))
    result = _content_raw(ltype, lprofile, F.col(f008), sixes)
    return _content_finish(
        result, ltype,
        F.col(has_502) if has_502 is not None else None,
        F.col(has_020) if has_020 is not None else None,
    )


def primary_content_type_expr(**kwargs) -> Column:
    """First content type, '' when none (getPrimaryContentType,
    GetFormatMixin.java:271-285)."""
    types = content_types_expr(**kwargs)
    return F.coalesce(F.element_at(types, 1), F.lit(""))


def is_archive_expr(leader: str = "leader") -> Column:
    """leader/08 == 'a' (isArchive, GetFormatMixin.java:292-306)."""
    return _lchar(F.coalesce(F.col(leader), F.lit("")), 8) == "a"


# ---------------------------------------------------------------------------
# media types (getMediaTypes, GetFormatMixin.java:827-1660)
# ---------------------------------------------------------------------------


def _media_from_007(fld: Column) -> Column:
    """One 007's media contribution as an array (a sound disc can emit
    SoundDisc + SoundDiscCD/LP). Malformed 007s (len <= 2, or byte2 not
    one of ' ', '|', '-' — the pre-1981 layout check at :855-866) emit
    nothing."""
    b0 = _lchar(fld, 0)
    b1 = _lchar(fld, 1)
    b2 = _lchar(fld, 2)
    bad = (F.length(fld) <= 2) | ~b2.isin(" ", "|", "-")
    empty = F.array().cast("array<string>")

    # the per-b0 nested (b1 map, default) switches flatten into TWO
    # foldable map lookups — (b0+b1) pair hits, then the per-b0 default
    # (which also carries the b1-independent flat codes) — instead of a
    # when-chain embedding eleven 10-20-branch CaseWhens
    pair_map = {
        g0 + c: v
        for g0, (mapping, _) in _MEDIA_007.items()
        for c, v in mapping.items()
    }
    pair_map.update({"t" + c: v for c, v in _MEDIA_TEXT[0].items()})
    dflt_map = {g0: d for g0, (_, d) in _MEDIA_007.items()}
    dflt_map["t"] = _MEDIA_TEXT[1]
    dflt_map.update(_MEDIA_007_FLAT)
    single = F.coalesce(
        _switch(F.concat(b0, b1), pair_map, None),
        _switch(b0, dflt_map, None),
    )

    # sound: 's' + 'd' adds SoundDisc plus a CD/LP refinement from byte 3
    b3 = _lchar(fld, 3)
    sound_extra = F.when(b3 == "f", "SoundDiscCD").otherwise(
        F.when(b3.isin("a", "b", "d", "e"), "SoundDiscLP")
    )
    sound_arr = F.when(
        b1 == "d",
        F.filter(
            F.array(F.lit("SoundDisc"), sound_extra), lambda x: x.isNotNull()
        ),
    ).otherwise(F.array(_switch(b1, _MEDIA_SOUND[0], _MEDIA_SOUND[1])))

    # video: byte 4 when present, else the byte-1 carrier form (:1452-1607)
    b4 = _lchar(fld, 4)
    video = F.when(
        F.length(fld) >= 5, _switch(b4, _MEDIA_VIDEO4[0], _MEDIA_VIDEO4[1])
    ).otherwise(_switch(b1, _MEDIA_VIDEO1[0], _MEDIA_VIDEO1[1]))

    arr = (
        F.when(b0 == "s", sound_arr)
        .when(b0 == "v", F.array(video))
        # filter-of-singleton references ``single`` once; the
        # isNotNull-guard shape embedded its whole tree twice
        .otherwise(F.filter(F.array(single), lambda x: x.isNotNull()))
    )
    return F.when(bad, empty).otherwise(arr)


def _form_of_item(field: Column, profile: Column, shift: int) -> Column:
    """008/006 form-of-item media contribution (GetFormatMixin.java:
    1610-1660): byte 23 (books/computers/mixed/music/serial) or 29
    (maps/visual), 006 shifted -7; unknown profile or short field -> NULL."""
    pos23 = F.lit(23 - shift)
    pos29 = F.lit(29 - shift)
    pos = (
        F.when(
            profile.isin("books", "computers", "mixed", "music", "serial"),
            pos23,
        )
        .when(profile.isin("maps", "visual"), pos29)
        .otherwise(F.lit(None).cast("int"))
    )
    ch = F.lower(F.substring(field, pos + 1, F.lit(1)))
    return F.when(
        pos.isNotNull() & (F.length(field) > pos),
        _switch(ch, _MEDIA_FORM, None),
    )


def media_types_expr(
    leader: str = "leader",
    f008: str = "f008",
    f006s: str = "f006s",
    f007s: str = "f007s",
    title_h: str | None = None,
) -> Column:
    """Ordered deduplicated media/carrier types (getMediaTypes,
    GetFormatMixin.java:827-1660): 245$h electronic GMD, each 007's nested
    char maps, then the 008/006 form-of-item byte."""
    parts = []
    if title_h is not None:
        parts.append(
            F.array(
                F.when(
                    F.lower(F.coalesce(F.col(title_h), F.lit(""))).contains(
                        "[electronic resource]"
                    ),
                    "Electronic",
                )
            )
        )
    sevens = F.coalesce(F.col(f007s), F.array().cast("array<string>"))
    parts.append(F.flatten(F.transform(sevens, _media_from_007)))
    ldr = F.coalesce(F.col(leader), F.lit(""))
    _, lprofile = _type_profile(ldr, "leader")
    c008 = F.col(f008)
    parts.append(
        F.array(
            F.when(c008.isNotNull(), _form_of_item(c008, lprofile, 0))
        )
    )
    sixes = F.coalesce(F.col(f006s), F.array().cast("array<string>"))

    def per_006(fld: Column) -> Column:
        _, p6 = _type_profile(fld, "006")
        return _form_of_item(fld, p6, 7)

    parts.append(F.transform(sixes, per_006))
    raw = F.concat(*parts)
    return F.array_distinct(F.filter(raw, lambda x: x.isNotNull()))


# ---------------------------------------------------------------------------
# hasFullText + online combinators (GetFormatMixin.java:245-263, 2023-2060)
# ---------------------------------------------------------------------------

_SUPPL_NOTE = "(?i)(table of contents|abstract|description|sample text)"


def has_full_text_expr(f856s: str = "f856s") -> Column:
    """Fulltext-link presence: MarcUtils.getFullTextUrls (ind2 0 -> yes,
    2 -> no, else yes unless the $3/$z note is supplemental;
    MarcUtils.java:1526-1554, 1591-1611) nonempty AND any 856$u without
    'loc.gov' (the mixin's double-check, GetFormatMixin.java:2040-2056)."""
    arr = F.coalesce(
        F.col(f856s),
        F.array().cast(
            "array<struct<ind2:string,url:string,note:string>>"
        ),
    )
    fulltext = F.exists(
        arr,
        lambda x: x["url"].isNotNull()
        & (
            (x["ind2"] == "0")
            | (
                (x["ind2"] != "2")
                & ~F.coalesce(x["note"], F.lit("")).rlike(_SUPPL_NOTE)
            )
        ),
    )
    non_loc = F.exists(
        arr,
        lambda x: x["url"].isNotNull()
        & ~F.lower(x["url"]).contains("loc.gov"),
    )
    return fulltext & non_loc


def add_online_types_expr(formats: Column, online: Column) -> Column:
    """addOnlineTypes (GetFormatMixin.java:245-263): online && Book ->
    EBook at the top; online -> Online appended (set add)."""
    with_ebook = F.when(
        online & F.array_contains(formats, "Book"),
        F.array_distinct(F.concat(F.array(F.lit("EBook")), formats)),
    ).otherwise(formats)
    return F.when(
        online,
        F.array_distinct(
            F.concat(with_ebook, F.array(F.lit("Online")))
        ),
    ).otherwise(with_ebook)


def content_and_media_types_expr(
    leader: str = "leader",
    f008: str = "f008",
    f006s: str = "f006s",
    f007s: str = "f007s",
    title_h: str | None = None,
    has_502: str | None = None,
    has_020: str | None = None,
    f856s: str | None = None,
) -> Column:
    """getContentTypesAndMediaTypes (GetFormatMixin.java:210-216): content
    ++ media, then the online additions."""
    types = F.array_distinct(
        F.concat(
            content_types_expr(
                leader=leader, f008=f008, f006s=f006s,
                has_502=has_502, has_020=has_020,
            ),
            media_types_expr(
                leader=leader, f008=f008, f006s=f006s, f007s=f007s,
                title_h=title_h,
            ),
        )
    )
    if f856s is None:
        return types
    return add_online_types_expr(types, has_full_text_expr(f856s))


def with_mixin_types(
    df,
    leader: str = "leader",
    f008: str = "f008",
    f006s: str = "f006s",
    f007s: str = "f007s",
    title_h: str | None = None,
    has_502: str | None = None,
    has_020: str | None = None,
    f856s: str | None = None,
    out: str = "mixin_types",
):
    """Full-corpus mixin classifier as a STAGED DataFrame transform —
    the scale path for getContentTypesAndMediaTypes + addOnlineTypes.

    Each heavy sub-expression (leader type, raw content set, media set,
    fulltext flag) is aliased exactly once in its own Project; downstream
    stages reference the named column. Catalyst's CollapseProject keeps
    non-cheap aliases that are referenced more than once un-inlined, so
    the thesis/fallback/online combiners — which each embed their input
    2-3 times — never multiply the big trees the way the single nested
    ``content_and_media_types_expr`` Column does. Combined with the
    foldable-map ``_switch``, every generated Project stays under the JIT
    huge-method limit and inside whole-stage codegen (verified in
    tests/test_getformat.py::test_with_mixin_types_codegen).

    Appends ``out`` (array<string>) and drops the intermediates."""
    ldr = F.coalesce(F.col(leader), F.lit(""))
    ltype, lprofile = _type_profile(ldr, "leader")
    sixes = F.coalesce(F.col(f006s), F.array().cast("array<string>"))
    staged = df.withColumns({
        "_mx_ltype": ltype,
        "_mx_content_raw": _content_raw(
            ltype, lprofile, F.col(f008), sixes
        ),
        "_mx_media": media_types_expr(
            leader=leader, f008=f008, f006s=f006s, f007s=f007s,
            title_h=title_h,
        ),
        "_mx_online": (
            has_full_text_expr(f856s) if f856s is not None else F.lit(False)
        ),
    })
    staged = staged.withColumn(
        "_mx_content",
        _content_finish(
            F.col("_mx_content_raw"), F.col("_mx_ltype"),
            F.col(has_502) if has_502 is not None else None,
            F.col(has_020) if has_020 is not None else None,
        ),
    ).withColumn(
        "_mx_types",
        F.array_distinct(F.concat("_mx_content", "_mx_media")),
    ).withColumn(
        out, add_online_types_expr(F.col("_mx_types"), F.col("_mx_online"))
    )
    return staged.drop(
        "_mx_ltype", "_mx_content_raw", "_mx_media", "_mx_online",
        "_mx_content", "_mx_types",
    )


def primary_content_type_plus_online_expr(
    leader: str = "leader",
    f008: str = "f008",
    f006s: str = "f006s",
    has_502: str | None = None,
    has_020: str | None = None,
    f856s: str = "f856s",
) -> Column:
    """getPrimaryContentTypePlusOnline (GetFormatMixin.java:224-236)."""
    primary = primary_content_type_expr(
        leader=leader, f008=f008, f006s=f006s,
        has_502=has_502, has_020=has_020,
    )
    return add_online_types_expr(
        F.array(primary), has_full_text_expr(f856s)
    )
