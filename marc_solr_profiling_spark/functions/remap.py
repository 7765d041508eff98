"""Translation maps (SURVEY.md §2.9): value -> mapped value.

Re-expresses ``Utils.remap`` (core/src/org/solrmarc/tools/Utils.java:
327-424) and the map-loading conventions of ``SolrIndexer.java:496-602``
(the 19 ``translation_maps/*.properties`` files ship exactly these shapes):

  * plain maps      {raw -> mapped}, with the special keys the reference
                    honors: ``__DEFAULT`` fallback, empty-key fallback, and
                    ``displayRawIfMissing`` (pass the raw value through).
  * pattern maps    ordered ``pattern_N = regex => replacement`` rules with
                    ``$1`` backrefs; FIRST matching rule wins; optionally
                    all rules applied cumulatively (the reference's
                    pattern-map loop applies each matching rule in order).

Spark shape: a plain map becomes a literal ``create_map`` (broadcast by
value) + ``element_at`` — a broadcast hash join in expression form; a
pattern map becomes an ordered ``when`` chain of ``regexp_replace`` —
whole-stage codegen, no Python.
"""

from __future__ import annotations

import re
from itertools import chain
from typing import Mapping, Sequence, Tuple

from pyspark.sql import Column
from pyspark.sql import functions as F

DISPLAY_RAW = "displayRawIfMissing"


def remap_expr(col: str | Column, mapping: Mapping[str, str],
               default: str | None = None,
               display_raw_if_missing: bool = False) -> Column:
    """Plain translation map as a literal-map lookup.

    ``default`` plays ``__DEFAULT``; ``display_raw_if_missing`` the
    reference's pass-through flag (Utils.java:354-369). Missing + no
    fallback -> NULL (the reference drops the value)."""
    c = F.col(col) if isinstance(col, str) else col
    m = dict(mapping)
    if "__DEFAULT" in m and default is None:
        default = m.pop("__DEFAULT")
    if not m:
        looked = F.lit(None).cast("string")
    else:
        lit_map = F.create_map(
            *chain.from_iterable((F.lit(k), F.lit(v)) for k, v in m.items())
        )
        looked = F.element_at(lit_map, c)
    if display_raw_if_missing:
        return F.coalesce(looked, c)
    if default is not None:
        return F.coalesce(looked, F.lit(default))
    return looked


def remap_multi_expr(arr_col: str | Column, mapping: Mapping[str, str],
                     default: str | None = None) -> Column:
    """Map every element of an array column, dropping unmapped values and
    deduplicating (the Set-valued remap path, Utils.java:394-424)."""
    c = F.col(arr_col) if isinstance(arr_col, str) else arr_col
    mapped = F.transform(c, lambda v: remap_expr(v, mapping, default=default))
    return F.array_distinct(F.filter(mapped, lambda v: v.isNotNull()))


_JAVA_BACKREF = re.compile(r"\$(\d)")


def pattern_map_expr(col: str | Column,
                     rules: Sequence[Tuple[str, str]],
                     first_match_wins: bool = True) -> Column:
    """Ordered regex rewrite rules (``pattern_N = regex => repl`` with $1
    backrefs, Utils.java:372-392).

    first_match_wins=True: the when-chain returns the FIRST rule whose
    regex matches (each rule's replacement applied via regexp_replace).
    first_match_wins=False: every rule is applied in order, cumulatively
    (the reference's loop when multiple patterns should compose)."""
    c = F.col(col) if isinstance(col, str) else col
    if not first_match_wins:
        out = c
        for pat, repl in rules:
            out = F.regexp_replace(out, pat, _JAVA_BACKREF.sub(r"$\1", repl))
        return out
    expr = None
    for pat, repl in rules:
        branch = F.regexp_replace(c, pat, _JAVA_BACKREF.sub(r"$\1", repl))
        cond = c.rlike(pat)
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    return expr.otherwise(F.lit(None).cast("string")) if expr is not None else c


def load_properties_map(text: str) -> dict[str, str]:
    """Parse a ``translation_maps/*.properties`` body into a dict — the
    shape ``SolrIndexer.loadTranslationMap`` reads (SolrIndexer.java:
    496-602). Pattern entries (``pattern_N``) are returned under their keys
    so callers can split them out and order by N."""
    out: dict[str, str] = {}
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        k, sep, v = line.partition("=")
        if not sep:
            continue
        out[k.strip()] = v.strip()
    return out


def split_pattern_rules(props: Mapping[str, str]) -> list[Tuple[str, str]]:
    """Extract ordered pattern_N rules ('regex=>replacement')."""
    rules = []
    for k in sorted(
        (k for k in props if k.startswith("pattern_")),
        key=lambda k: int(k.split("_", 1)[1]),
    ):
        pat, sep, repl = props[k].partition("=>")
        if sep:
            rules.append((pat.strip(), repl.strip()))
    return rules
