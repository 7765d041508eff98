"""Solr ``sort`` parameter grammar -> Spark sort keys.

The reference's handlers ship multi-key sort defaults — e.g. the advanced
handler's ``score desc, pub_date_sort desc, title_sort asc``
(test/solr/conf/solrconfig.xml:255) and the default handler's
``score desc`` (profiling/solr/conf/solrconfig.xml:70). Solr's grammar is a
comma-separated list of ``<field|score> <asc|desc>`` entries, direction
required; missing values sort last (the schema's sort fields declare
``sortMissingLast=true``, schema.xml alphaOnlySort type).

``apply_sort`` is a driver-side plan rewrite only — the sort itself stays a
native Spark global sort (range-partitioned exchange; with a trailing
``limit`` Catalyst collapses it to TakeOrderedAndProject, no full sort)."""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parse_sort_spec(spec: str) -> List[Tuple[str, bool]]:
    """``"score desc, pub_date_sort desc, title_sort asc"`` ->
    ``[("score", False), ("pub_date_sort", False), ("title_sort", True)]``
    (second element: ascending). Raises on a missing/unknown direction,
    like Solr's SortSpecParsing."""
    out: List[Tuple[str, bool]] = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        pieces = part.split()
        if len(pieces) != 2 or pieces[1].lower() not in ("asc", "desc"):
            raise ValueError(
                f"sort spec entry {part!r}: expected '<field> asc|desc'"
            )
        out.append((pieces[0], pieces[1].lower() == "asc"))
    if not out:
        raise ValueError("empty sort spec")
    return out


def sort_columns(spec: str) -> List[Column]:
    """The spec as Spark sort-key Columns, missing-last in BOTH
    directions (sortMissingLast)."""
    cols = []
    for field, asc in parse_sort_spec(spec):
        c = F.col(field)
        cols.append(c.asc_nulls_last() if asc else c.desc_nulls_last())
    return cols


def apply_sort(df: DataFrame, spec: str, limit: int | None = None
               ) -> DataFrame:
    """Order ``df`` per the Solr sort spec; with ``limit``, Catalyst plans
    TakeOrderedAndProject (per-partition top-k + merge) instead of a full
    range-partitioned sort."""
    out = df.orderBy(*sort_columns(spec))
    return out.limit(int(limit)) if limit is not None else out


def cursor_after_expr(spec: str, cursor: "tuple | list") -> Column:
    """The cursorMark keyset predicate: rows strictly AFTER ``cursor``
    in the total order of ``spec``. For sort keys ``a asc, b desc`` and
    cursor values ``(v1, v2)`` this is
    ``(a > v1) OR (a = v1 AND b < v2)`` — the standard lexicographic
    row-comparison expansion, all plain comparisons that Catalyst can
    push into scans and whole-stage codegen.

    Solr's cursorMark (CursorMarkParams; the deep-paging replacement for
    ``start=N`` offsets) requires the sort to end on the uniqueKey field
    so the order is total and a cursor is never ambiguous — same
    contract here: pass a spec whose last key is unique and non-null.
    Cursor values must be non-null (a Solr uniqueKey never is).
    """
    keys = parse_sort_spec(spec)
    if len(cursor) != len(keys):
        raise ValueError(
            f"cursor has {len(cursor)} values for {len(keys)} sort keys")
    clause = None
    for i, (field, asc) in enumerate(keys):
        eq_prefix = None
        for j in range(i):
            e = F.col(keys[j][0]) == F.lit(cursor[j])
            eq_prefix = e if eq_prefix is None else (eq_prefix & e)
        strict = (F.col(field) > F.lit(cursor[i]) if asc
                  else F.col(field) < F.lit(cursor[i]))
        term = strict if eq_prefix is None else (eq_prefix & strict)
        clause = term if clause is None else (clause | term)
    return clause


def cursor_page(df: DataFrame, spec: str, cursor: "tuple | list | None",
                page_size: int = 10) -> DataFrame:
    """One cursorMark page: the first ``page_size`` rows of the
    ``spec`` total order strictly after ``cursor`` (``cursor=None`` =
    the ``cursorMark=*`` first page). Unlike ``start=N`` offset paging
    (which makes every deep page a top-(N+rows) problem), the keyset
    predicate filters BEFORE the top-k, so every page is the same
    TakeOrderedAndProject over the surviving rows — the exact reason
    Solr added cursorMark for deep pagination.
    """
    out = df if cursor is None else df.filter(cursor_after_expr(spec, cursor))
    return apply_sort(out, spec, limit=page_size)
