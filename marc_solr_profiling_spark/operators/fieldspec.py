"""The reference's field-spec extraction DSL (its core "SELECT"), as native
Spark array expressions over MARC-shaped rows.

The reference drives every indexed field from a declarative spec
``solr_field = tagspec, handling, map`` parsed by
``SolrIndexer.fillMapFromProperties`` (core/src/org/solrmarc/index/
SolrIndexer.java:152-324) and evaluated per record by ``getFieldList``
(core/src/org/solrmarc/tools/MarcUtils.java:1280-1345). This module
re-expresses that DSL over a DataFrame whose rows carry the SURVEY.md §1.1
record shape:

    leader        string
    controlfields array<struct<tag:string, data:string>>
    datafields    array<struct<tag:string, ind1:string, ind2:string,
                      subfields:array<struct<code:string, value:string>>>>

Everything here is a pure Column expression (transform/filter/aggregate —
whole-stage codegen, no Python), so Catalyst prunes and pushes down around
it; specs are parsed driver-side once (the analog of the reference parsing
its .properties once at startup).

Spec grammar supported (the subset exercised by profiling/prof_index.properties):
  245ab          data field tag + subfield codes to concat (space-sep)
  245a:100b      colon-separated alternatives -> ordered union w/ dedup
                 (LinkedHashSet semantics, MarcUtils.java:1282-1344)
  008[35-37]     control-field byte range      (MarcUtils.java:699-754)
  000[6]         leader byte(s) via pseudo-tag 000 (MarcUtils.java:655-660)
  100[a-cf-z]    subfield regex char-class     (MarcUtils.java:1310-1317)
  245ab'sep'     custom separator              (MarcUtils.java:1300-1309)
"""

from __future__ import annotations

import re
from typing import List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MARC_SCHEMA = T.StructType(
    [
        T.StructField("record_id", T.StringType(), False),
        T.StructField("leader", T.StringType(), True),
        T.StructField(
            "controlfields",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("tag", T.StringType(), False),
                        T.StructField("data", T.StringType(), True),
                    ]
                )
            ),
            True,
        ),
        T.StructField(
            "datafields",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("tag", T.StringType(), False),
                        T.StructField("ind1", T.StringType(), True),
                        T.StructField("ind2", T.StringType(), True),
                        T.StructField(
                            "subfields",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("code", T.StringType(), False),
                                        T.StructField("value", T.StringType(), True),
                                    ]
                                )
                            ),
                            True,
                        ),
                    ]
                )
            ),
            True,
        ),
    ]
)

_SPEC_RE = re.compile(
    r"^(?P<tag>\d{3}|LNK\d{3})"
    r"(?:\[(?P<range>[0-9]+(?:-[0-9]+)?|[a-z0-9\-]+)\])?"
    r"(?P<codes>[a-z0-9]*)"
    r"(?:'(?P<sep>[^']*)')?$"
)


class _OneSpec:
    def __init__(self, tag: str, byte_range, codes: str, sep: str, linked: bool):
        self.tag = tag
        self.byte_range = byte_range  # (lo, hi) inclusive char idx or None
        self.codes = codes            # subfield code set/class ('' = all)
        self.sep = sep
        self.linked = linked          # LNK prefix -> resolve via 880 $6


def parse_spec(spec: str) -> List[_OneSpec]:
    """Parse a colon-separated tagspec (SolrIndexer.java:188-210 splits on
    ':' outside quotes; each piece per MarcUtils.java:1286-1330)."""
    out: List[_OneSpec] = []
    for piece in spec.split(":"):
        m = _SPEC_RE.match(piece.strip())
        if not m:
            raise ValueError(f"unsupported fieldspec piece: {piece!r}")
        tag = m.group("tag")
        linked = tag.startswith("LNK")
        if linked:
            tag = tag[3:]
        rng = None
        codes = m.group("codes") or ""
        grp = m.group("range")
        if grp:
            is_control = tag.isdigit() and int(tag) < 10
            if is_control and re.fullmatch(r"[0-9]+(-[0-9]+)?", grp):
                lo, _, hi = grp.partition("-")
                rng = (int(lo), int(hi or lo))
            else:
                # char-class like a-cf-z (MarcUtils.java:1310-1317)
                codes = grp
        out.append(_OneSpec(tag, rng, codes, m.group("sep") or " ", linked))
    return out


def _code_matches(code: Column, codes: str) -> Column:
    if not codes:
        return F.lit(True)
    if "-" in codes:
        return code.rlike(f"^[{codes}]$")
    return code.isin(list(codes))


def _datafield_values(
    fields: Column, spec: _OneSpec
) -> Column:
    """Per matching field instance: concat of selected subfield values with
    the spec separator (getSubfieldDataAsSet, MarcUtils.java:633-685)."""
    matching = F.filter(fields, lambda f: f["tag"] == spec.tag)
    return F.transform(
        matching,
        lambda f: F.array_join(
            F.transform(
                F.filter(
                    f["subfields"],
                    lambda s: _code_matches(s["code"], spec.codes)
                    & s["value"].isNotNull(),
                ),
                lambda s: s["value"],
            ),
            spec.sep,
        ),
    )


def _linked_880_values(fields: Column, spec: _OneSpec) -> Column:
    """Vernacular parallels: 880 fields whose $6 starts with the host tag
    (getLinkedVariableFields, MarcUtils.java:217-233)."""
    matching = F.filter(
        fields,
        lambda f: (f["tag"] == "880")
        & F.exists(
            f["subfields"],
            lambda s: (s["code"] == "6")
            & s["value"].startswith(spec.tag + "-"),
        ),
    )
    return F.transform(
        matching,
        lambda f: F.array_join(
            F.transform(
                F.filter(
                    f["subfields"],
                    lambda s: _code_matches(s["code"], spec.codes)
                    & (s["code"] != "6")
                    & s["value"].isNotNull(),
                ),
                lambda s: s["value"],
            ),
            spec.sep,
        ),
    )


def _control_values(control: Column, leader: Column, spec: _OneSpec) -> Column:
    """Control-field payload (tag 000 = leader, MarcUtils.java:655-660),
    optionally a byte range [lo-hi] INCLUSIVE (MarcUtils.java:699-754)."""
    if spec.tag == "000":
        vals = F.array(leader)
    else:
        vals = F.transform(
            F.filter(control, lambda c: c["tag"] == spec.tag),
            lambda c: c["data"],
        )
    if spec.byte_range is not None:
        lo, hi = spec.byte_range
        vals = F.transform(
            vals, lambda v: v.substr(F.lit(lo + 1), F.lit(hi - lo + 1))
        )
    return F.filter(vals, lambda v: v.isNotNull() & (v != ""))


def field_list_expr(spec: str,
                    datafields: str = "datafields",
                    controlfields: str = "controlfields",
                    leader: str = "leader") -> Column:
    """``getFieldList(record, tagStr)`` (MarcUtils.java:1280-1345) as one
    Column: ordered union of all colon-separated pieces, deduplicated
    (LinkedHashSet -> array_distinct preserves first-occurrence order)."""
    pieces = []
    for one in parse_spec(spec):
        if one.linked:
            pieces.append(_linked_880_values(F.col(datafields), one))
        elif one.tag == "000" or int(one.tag) < 10:
            pieces.append(
                _control_values(F.col(controlfields), F.col(leader), one)
            )
        else:
            pieces.append(_datafield_values(F.col(datafields), one))
    merged = pieces[0]
    for p in pieces[1:]:
        merged = F.concat(merged, p)
    return F.array_distinct(
        F.filter(merged, lambda v: v.isNotNull() & (v != ""))
    )


# every code a MARC subfield can carry: the regex universe for
# getAllSubfields subfield patterns is this finite alphabet
_CODE_ALPHABET = (
    "abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "0123456789"
)


def codes_matching_regex(pattern: str) -> list[str]:
    """Evaluate an arbitrary subfield-code regex against the single-char
    code alphabet. The reference compiles the spec's code part as a full
    Java regex and `matches()` it per code (MarcUtils.java:541-585); since
    codes are single characters, the whole regex collapses driver-side to
    a literal membership set — the executor plan stays a pure `isin`."""
    pat = re.compile(pattern if pattern else ".")
    return [c for c in _CODE_ALPHABET if pat.fullmatch(c)]


def all_subfields_expr(
    field_spec: str,
    separator: str | None = " ",
    datafields: str = "datafields",
    clean: bool = True,
) -> Column:
    """``getAllSubfields(record, fieldSpec, separator)``
    (MarcUtils.java:541-585): one value per matching field instance — the
    concatenation of subfields whose code fully matches the piece's regex
    (arbitrary pattern: char class, alternation, negation; empty = all) —
    cleaned and set-deduplicated in first-occurrence order.

    The subfield regex is pre-collapsed to a code set (see
    :func:`codes_matching_regex`), so the executor-side plan is
    filter/transform/array_join whole-stage codegen; only the terminal
    cleanData fixpoint leaves the JVM (Arrow-batched, one call per row).
    """
    sep = separator if separator is not None else " "

    def _piece_values(tag: str, codes: list[str]) -> Column:
        # single-param lambdas only: a 2-arg lambda would be read by
        # F.filter/F.transform as the (element, index) form
        matching = F.filter(F.col(datafields), lambda f: f["tag"] == tag)
        vals = F.transform(
            matching,
            lambda f: F.array_join(
                F.transform(
                    F.filter(
                        f["subfields"],
                        lambda s: s["code"].isin(codes) & s["value"].isNotNull(),
                    ),
                    lambda s: F.trim(s["value"]),
                ),
                sep,
            ),
        )
        return F.filter(vals, lambda v: v != "")

    pieces = []
    for piece in field_spec.split(":"):
        piece = piece.strip()
        if len(piece) < 3:
            continue  # reference logs invalid tag and skips
        pieces.append(
            _piece_values(piece[:3], codes_matching_regex(piece[3:]))
        )
    if not pieces:
        return F.array().cast(T.ArrayType(T.StringType()))
    merged = pieces[0]
    for p in pieces[1:]:
        merged = F.concat(merged, p)
    if clean:
        from marc_solr_profiling_spark.functions.cleaning import clean_array_udf

        merged = clean_array_udf()(merged)
    return F.array_distinct(merged)


def all_alpha_subfields_expr(tag: str, mode: str = "all",
                             datafields: str = "datafields") -> Column:
    """``getAllAlphaSubfields`` (MarcUtils.java:881-918, 938-967): only
    alphabetic subfield codes, one result per field instance; multi-
    occurrence modes first/join/all (MarcUtils.java:938-967)."""
    per_field = F.transform(
        F.filter(F.col(datafields), lambda f: f["tag"] == tag),
        lambda f: F.array_join(
            F.transform(
                F.filter(
                    f["subfields"],
                    lambda s: s["code"].rlike("^[a-z]$") & s["value"].isNotNull(),
                ),
                lambda s: s["value"],
            ),
            " ",
        ),
    )
    per_field = F.filter(per_field, lambda v: v != "")
    if mode == "first":
        return F.element_at(per_field, 1)
    if mode == "join":
        return F.array_join(per_field, " ")
    return per_field


def all_searchable_expr(lo: int, hi: int,
                        datafields: str = "datafields") -> Column:
    """``getAllSearchableFields(rec, lo, hi)`` (MarcUtils.java:178-202):
    concat of ALL subfields of data fields with lo <= tag < hi — the
    catch-all search text (the analog of the web page's ``text`` column)."""
    fields = F.filter(
        F.col(datafields),
        lambda f: (f["tag"].cast("int") >= lo) & (f["tag"].cast("int") < hi),
    )
    return F.array_join(
        F.flatten(
            F.transform(
                fields,
                lambda f: F.transform(
                    F.filter(f["subfields"], lambda s: s["value"].isNotNull()),
                    lambda s: s["value"],
                ),
            )
        ),
        " ",
    )


def remove_fields_expr(tag_pattern: str,
                       datafields: str = "datafields") -> Column:
    """Negative projection (MarcUtils.removeFields, MarcUtils.java:67-77;
    MarcFilteredReader delete-subfields, MarcFilteredReader.java:126-160)."""
    return F.filter(
        F.col(datafields), lambda f: ~f["tag"].rlike(tag_pattern)
    )


def include_if_present(df: DataFrame, spec: str,
                       contains: Optional[str] = None) -> DataFrame:
    """``marc.include_if_present`` / ``…contains`` record filter
    (MarcFilteredReader.java:59-79, 161-171): keep a record iff the spec
    yields values (optionally one matching a regex)."""
    vals = field_list_expr(spec)
    cond = F.size(vals) > 0
    if contains is not None:
        cond = F.exists(vals, lambda v: v.rlike(contains))
    return df.filter(cond)


def include_if_missing(df: DataFrame, spec: str) -> DataFrame:
    """Inverse gate (MarcFilteredReader.java:173-181)."""
    return df.filter(F.size(field_list_expr(spec)) == 0)


def first_field_expr(spec: str, **kw) -> Column:
    """'first' handling (SolrIndexer.java:645-646): first value only."""
    return F.element_at(field_list_expr(spec, **kw), 1)


def all_alpha_except_expr(spec: str,
                          datafields: str = "datafields") -> Column:
    """``getAllAlphaExcept`` (MarcUtils.java:122-160): per colon-separated
    ``tag + tabooCodes`` entry, every ALPHABETIC subfield whose code is NOT
    in the taboo list, trimmed and space-joined per field instance; empty
    results dropped, ordered union across entries."""
    def _tag_filter(t):
        # arity-1 closures: two-arg default-param lambdas would receive
        # the array INDEX as the second argument
        return lambda f: f["tag"] == t

    def _joiner(tb):
        def inner(f):
            keep = F.filter(
                f["subfields"],
                lambda s: s["code"].rlike("^[A-Za-z]$")
                & (~s["code"].isin(list(tb)) if tb else F.lit(True))
                & s["value"].isNotNull(),
            )
            return F.array_join(
                F.transform(keep, lambda s: F.trim(s["value"])), " "
            )
        return inner

    parts = []
    for entry in spec.split(":"):
        tag, taboo = entry[:3], entry[3:]
        per_field = F.transform(
            F.filter(F.col(datafields), _tag_filter(tag)), _joiner(taboo)
        )
        parts.append(F.filter(per_field, lambda v: v != ""))
    out = parts[0]
    for p in parts[1:]:
        out = F.concat(out, p)
    return F.array_distinct(out)


def delete_subfields_expr(tag: str, codes: str,
                          datafields: str = "datafields") -> Column:
    """Subfield-level delete projection (``marc.delete_subfields``,
    MarcFilteredReader.java:126-160): strip the listed subfield codes from
    fields with the given tag before indexing; other fields pass through
    untouched. (The reference mutates the record in the reader decorator —
    here it is a pure array transform.)"""
    return F.transform(
        F.col(datafields),
        lambda f: F.when(
            f["tag"] == tag,
            F.struct(
                f["tag"].alias("tag"),
                f["ind1"].alias("ind1"),
                f["ind2"].alias("ind2"),
                F.filter(
                    f["subfields"], lambda s: ~s["code"].isin(list(codes))
                ).alias("subfields"),
            ),
        ).otherwise(f),
    )


def longest_value_expr(spec: str, **kw) -> Column:
    """``getSingleIndexEntry`` (SolrIndexer.java:1184-1218): of multiple
    extracted values return the LONGEST; ties resolve to the FIRST longest
    (the reference's strict '>' scan). Null when the spec yields nothing.
    (The 'flag extras as errors' side channel maps to the quarantine
    pattern — count ``size(vals) > 1`` rows separately when needed.)"""
    vals = field_list_expr(spec, **kw)
    return F.aggregate(
        vals,
        F.lit(None).cast("string"),
        lambda acc, v: F.when(
            acc.isNull() | (F.length(v) > F.length(acc)), v
        ).otherwise(acc),
    )


def combined_orig_vernacular_expr(spec: str, **kw) -> Column:
    """Original + linked-880 vernacular values in one list
    (``getLinkedFieldCombined``, MarcUtils.java:372-402): the plain spec's
    values followed by the LNK-spec's parallels, ordered-deduplicated
    (LinkedHashSet union)."""
    orig = field_list_expr(spec, **kw)
    vern = field_list_expr("LNK" + spec, **kw)
    return F.array_distinct(F.concat(orig, vern))


def stanford_all_fields_expr(
    lo: int = 100,
    hi: int = 900,
    keepers: tuple = ("024", "027", "028", "905", "908", "920", "986"),
    datafields: str = "datafields",
) -> Column:
    """Stanford ``getAllFields`` (StanfordIndexer.java:1147-1190): one big
    string of every subfield of data fields in [lo, hi) PLUS the keeper
    tags outside the range ({024,027,028} standard numbers and
    {905,908,920,986} local fields)."""
    keep = list(keepers)
    fields = F.filter(
        F.col(datafields),
        lambda f: (
            (f["tag"].cast("int") >= lo) & (f["tag"].cast("int") < hi)
        ) | f["tag"].isin(keep),
    )
    return F.array_join(
        F.flatten(
            F.transform(
                fields,
                lambda f: F.transform(
                    F.filter(f["subfields"], lambda s: s["value"].isNotNull()),
                    lambda s: s["value"],
                ),
            )
        ),
        " ",
    )


def indicator_filtered_values_expr(
    tag: str, ind1_val: str, codes: str,
    datafields: str = "datafields",
) -> Column:
    """Indicator-filtered subfield extraction — the ``get024(ind1,
    subfields)`` standard-number pattern (StanfordIndexer.java:372-392):
    values of the listed subfield codes from fields with the given tag
    whose ind1 equals ``ind1_val``, ordered, deduplicated, empties
    dropped."""
    fields = F.filter(
        F.col(datafields),
        lambda f: (f["tag"] == tag) & (f["ind1"] == ind1_val),
    )
    vals = F.flatten(
        F.transform(
            fields,
            lambda f: F.transform(
                F.filter(
                    f["subfields"],
                    lambda s: _code_matches(s["code"], codes)
                    & s["value"].isNotNull() & (s["value"] != ""),
                ),
                lambda s: s["value"],
            ),
        )
    )
    return F.array_distinct(vals)
