"""HathiTrust JSON → MARC converter (the reference's ``HathiJsonToMarc``,
core/src/org/solrmarc/tools/HathiJsonToMarc.java:1-504).

The Hathi bib API wraps one MARC record per JSON object: the ``marc-xml``
member holds a complete MARCXML collection document as a string. The
reference streams those objects through a piped MarcXmlReader and then
applies two in-memory record fixups:

* ``fix880field`` (HathiJsonToMarc.java:311-350) — Hathi ships linked
  script pairs as two same-tag fields sharing a ``$6`` occurrence value
  (instead of the MARC 880 convention). For each such pair, the field
  whose subfield text carries the "other script" (more non-ASCII
  characters / larger code-point sum, ``hasOtherScript``
  HathiJsonToMarc.java:363-388) is retagged to 880 with
  ``$6 origTag-occurrence``, and the original keeps ``$6
  880-occurrence``; an exact tie means a duplicate field, which is
  dropped.
* ``make856fields`` (HathiJsonToMarc.java:276-308) — synthesize 856
  links from Hathi ``974`` item fields whose rights ``$r`` start with
  ``pd`` or equal ``world``: ``$u`` becomes
  ``http://hdl.handle.net/2027/<id>``, ordered by natural-compare of the
  item label (TreeMap semantics: equal labels keep the LAST item).

Spark shape: the JSON envelopes arrive as a string column (one object per
row — ``spark.read.text`` over ndjson dumps, or the output of a
driver-side fetch); conversion runs in the same Arrow ``mapInPandas``
pattern as the other readers, emitting MARC_SCHEMA rows with quarantine
``parse_error`` rows for malformed envelopes.
"""

from __future__ import annotations

import json
from typing import Iterator, List, Tuple

from pyspark.sql import DataFrame

from ..functions.cleaning import natural_sort_key
from .marc import RECORDS_SCHEMA, parse_marc_xml

HANDLE_PREFIX = "http://hdl.handle.net/2027/"

DataField = Tuple[str, str, str, List[Tuple[str, str]]]


def _first_subfield(df: DataField, code: str) -> str | None:
    for c, v in df[3]:
        if c == code:
            return v
    return None


def _script_weight(df: DataField) -> Tuple[int, int]:
    """(code-point sum, non-ASCII count) over all subfield values — the
    ``hasOtherScript`` ranking (HathiJsonToMarc.java:363-388)."""
    total = non_ascii = 0
    for _, v in df[3]:
        for ch in v or "":
            cp = ord(ch)
            total += cp
            if cp > 0x7F:
                non_ascii += 1
    return total, non_ascii


def _other_script(df1: DataField, df2: DataField) -> int:
    """1 if df1 carries the vernacular script, 2 if df2 does, 0 on a tie
    (= duplicate field). Mirrors the reference's comparison ladder."""
    sum1, count1 = _script_weight(df1)
    sum2, count2 = _script_weight(df2)
    if sum1 > sum2 and count1 > count2:
        return 1
    if sum1 < sum2 and count1 < count2:
        return 2
    if sum1 == sum2 and count1 > count2:
        return 1
    if sum1 == sum2 and count1 < count2:
        return 2
    if count1 > count2:
        return 1
    if count1 < count2:
        return 2
    return 0


def _set_subfield(df: DataField, code: str, value: str) -> DataField:
    subs = [(c, value if c == code else v) for c, v in df[3]]
    return (df[0], df[1], df[2], subs)


def fix_880_fields(datafields: List[DataField]) -> List[DataField]:
    """Resolve Hathi's same-tag ``$6``-paired script fields into proper
    880 linkage (``fix880field``). Pure function: returns a new list."""
    fields = list(datafields)
    deleted: set = set()
    for i, df in enumerate(fields):
        if i in deleted or fields[i][0] == "880":
            continue
        df = fields[i]
        link = _first_subfield(df, "6")
        if link is None:
            continue
        for j, other in enumerate(fields):
            if j == i or j in deleted or other[0] == "880":
                continue
            if _first_subfield(other, "6") != link:
                continue
            which = _other_script(df, other)
            if which == 2:
                # df keeps its tag, other becomes the 880
                fields[i] = _set_subfield(df, "6", f"880-{link}")
                retagged = _set_subfield(other, "6", f"{df[0]}-{link}")
                fields[j] = ("880", retagged[1], retagged[2], retagged[3])
            elif which == 1:
                fields[j] = _set_subfield(other, "6", f"880-{link}")
                retagged = _set_subfield(df, "6", f"{other[0]}-{link}")
                fields[i] = ("880", retagged[1], retagged[2], retagged[3])
            else:  # exact tie: duplicate field — drop the second
                deleted.add(j)
            break
    return [df for k, df in enumerate(fields) if k not in deleted]


def make_856_fields(datafields: List[DataField]) -> List[DataField]:
    """Append synthesized 856 link fields from full-view ``974`` items
    (``make856fields``): rights ``$r`` startswith('pd') or == 'world',
    ``$u`` required; ordered by natural compare of the ``$z`` label
    (falling back to ``$u``); equal sort labels keep the LAST item
    (TreeMap.put overwrite)."""
    by_label: dict = {}
    for df in datafields:
        if df[0] != "974":
            continue
        rights = _first_subfield(df, "r")
        if rights is None or not (
            rights.startswith("pd") or rights == "world"
        ):
            continue
        ident = _first_subfield(df, "u")
        if ident is None:
            continue
        label = _first_subfield(df, "z")
        # the reference keys its TreeMap on the label whenever $z is
        # PRESENT — even empty (labelField != null check); only an absent
        # $z falls back to the identifier
        sortlabel = label if label is not None else ident
        label = label or ""
        by_label[sortlabel] = (HANDLE_PREFIX + ident.strip(), rights, label)
    out = list(datafields)
    for sortlabel in sorted(by_label, key=natural_sort_key):
        url, rights, label = by_label[sortlabel]
        subs = [("u", url), ("r", rights)]
        if label:
            subs.append(("z", label))
        out.append(("856", "4", " ", subs))
    return out


def parse_hathi_json(envelope: str, add_856: bool = False):
    """One Hathi JSON envelope -> list of (leader, controlfields,
    datafields) with the 880 fixup (and optional 856 synthesis) applied.
    Raises ValueError on malformed input (the caller quarantines).

    The reference additionally normalizes the fraction-slash character
    (``value.replaceAll("⁄", "/")``, HathiJsonToMarc.java:231)."""
    try:
        obj = json.loads(envelope)
    except json.JSONDecodeError as e:
        raise ValueError(f"bad json: {e}") from e
    if not isinstance(obj, dict):
        raise ValueError("hathi envelope is not a JSON object")
    xml = obj.get("marc-xml")
    if not xml:
        raise ValueError("hathi envelope has no marc-xml member")
    xml = xml.replace("⁄", "/")
    out = []
    for leader, control, data in parse_marc_xml(xml):
        data = fix_880_fields(data)
        if add_856:
            data = make_856_fields(data)
        out.append((leader, control, data))
    return out


def read_hathi_json(json_df: DataFrame, json_col: str = "value",
                    add_856: bool = False,
                    path_col: str | None = None) -> DataFrame:
    """DataFrame of Hathi JSON envelope strings -> MARC_SCHEMA rows
    (+ path, seq, parse_error quarantine), the ``HathiJsonToMarc``
    MarcReader surface as a Spark scan."""
    import pandas as pd

    cols = [json_col] + ([path_col] if path_col else [])

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for i, env in enumerate(pdf[json_col]):
                path = pdf[path_col].iloc[i] if path_col else None
                try:
                    for seq, (leader, control, data) in enumerate(
                        parse_hathi_json(env, add_856=add_856)
                    ):
                        rid = next(
                            (d for t, d in control if t == "001"), ""
                        ).strip()
                        rows.append(
                            (path, seq, None, rid, leader, control, data)
                        )
                except ValueError as e:
                    rows.append((path, i, str(e), "", None, None, None))
            yield pd.DataFrame(
                rows,
                columns=["path", "seq", "parse_error", "record_id",
                         "leader", "controlfields", "datafields"],
            )

    return json_df.select(*cols).mapInPandas(parse, schema=RECORDS_SCHEMA)
