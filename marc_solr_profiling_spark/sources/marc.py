"""MARC21 binary (ISO 2709) source/sink — the reference's primary input
format, re-expressed for Spark.

Reference surfaces covered (SURVEY.md §2.1/§2.2):
  * binary stream scan  — ``MarcPermissiveStreamReader`` call site,
    core/src/org/solrmarc/marc/MarcHandler.java:425-431 (permissive:
    malformed records are skipped with an error note, never fatal)
  * raw-record scan     — ``RawRecordReader`` lazy split into (id, bytes)
    without full parse, core/src/org/solrmarc/marc/RawRecordReader.java:24-35,
    core/src/org/solrmarc/tools/RawRecord.java:26-131 (project-then-parse:
    the id comes from the directory alone)
  * serializer sinks    — ``MarcUtils.getRecordAsBinaryStr/JsonStr``
    core/src/org/solrmarc/tools/MarcUtils.java:1619-1691

Wire format (public ISO 2709 / MARC21): 24-byte leader (bytes 0-4 record
length, 12-16 base address), directory of 12-byte entries
(tag:3 len:4 start:5) terminated by 0x1E, then fields — data fields are
ind1 ind2 (0x1F code value)* 0x1E — and a 0x1D record terminator.

Spark shape: ``spark.read.format("binaryFile")`` (or any (path, content)
table) -> ``mapInPandas`` record splitter -> MARC_SCHEMA rows. Splitting is
per-file and order-preserving (``seq`` column), so the combining operators
(operators/marc_merge.py) see the reference's "consecutive records" notion.
"""

from __future__ import annotations

import json
from typing import Iterator, List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.fieldspec import MARC_SCHEMA

FT = b"\x1e"   # field terminator
RT = b"\x1d"   # record terminator
SF = b"\x1f"   # subfield delimiter

RECORDS_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), True),
        T.StructField("seq", T.IntegerType(), False),
        T.StructField("parse_error", T.StringType(), True),
    ]
    + list(MARC_SCHEMA.fields)
)


# ---------------------------------------------------------------------------
# pure-Python codec (shared by UDFs and tests)
# ---------------------------------------------------------------------------


def encode_record(leader: str, controlfields: List[Tuple[str, str]],
                  datafields) -> bytes:
    """Record -> ISO 2709 bytes. ``datafields`` rows are
    (tag, ind1, ind2, [(code, value), ...])."""
    parts: List[bytes] = []
    directory = b""
    start = 0
    for tag, data in controlfields:
        body = data.encode("utf-8") + FT
        directory += f"{tag:>03}{len(body):04d}{start:05d}".encode()
        parts.append(body)
        start += len(body)
    for tag, ind1, ind2, subs in datafields:
        body = (ind1 or " ").encode() + (ind2 or " ").encode()
        for code, value in subs:
            body += SF + code.encode() + (value or "").encode("utf-8")
        body += FT
        directory += f"{tag:>03}{len(body):04d}{start:05d}".encode()
        parts.append(body)
        start += len(body)
    directory += FT
    base = 24 + len(directory)
    payload = b"".join(parts) + RT
    total = base + len(payload)
    lead = (f"{total:05d}" + leader[5:12] + f"{base:05d}" + leader[17:24])
    lead = lead[:24].ljust(24)
    return lead.encode("utf-8")[:24] + directory + payload


def decode_record(buf: bytes, marc8: str = "never",
                  charset_errors: Optional[list] = None):
    """ISO 2709 bytes -> (leader, controlfields, datafields). Permissive:
    raises ValueError with a reason on structural corruption (the caller
    quarantines, mirroring MarcImporter's error triage,
    MarcImporter.java:202-257).

    ``marc8``: subfield-value charset handling — ``"never"`` (default)
    decodes UTF-8 with replacement; ``"auto"`` converts MARC-8/ANSEL
    when leader byte 09 is not ``'a'`` (the ``to_utf_8`` +
    ``MarcTranslatedReader`` convert path, which also only rewrites
    data-field subfields); ``"always"`` forces conversion. Opt-in
    because legacy fixtures with blank leader/09 but UTF-8 payloads
    (common in the wild) must not be mis-converted by default —
    matching the reference, where conversion is a config switch
    (``marc.to_utf_8`` / permissive BESTGUESS), not a constant.

    ``charset_errors``: optional list the MARC-8 path appends charset
    notes to (unmapped EACC codes, truncated multibyte codes — see
    ``marc8.marc8_decode``); callers surface them as soft-quarantine
    annotations instead of letting replacement text flow silently."""
    if len(buf) < 24:
        raise ValueError("record shorter than leader")
    leader = buf[:24].decode("utf-8", errors="replace")
    if marc8 == "always" or (marc8 == "auto" and (len(leader) < 10
                                                  or leader[9] != "a")):
        from .marc8 import marc8_decode

        def decode_value(bs: bytes) -> str:
            text, err = marc8_decode(bs)
            if err is not None and charset_errors is not None:
                charset_errors.append(err)
            return text
    else:
        def decode_value(bs: bytes) -> str:
            return bs.decode("utf-8", errors="replace")
    try:
        base = int(leader[12:17])
    except ValueError as e:
        raise ValueError(f"bad base address: {leader[12:17]!r}") from e
    dir_end = buf.find(FT)
    if dir_end < 0 or dir_end > base:
        raise ValueError("missing directory terminator")
    directory = buf[24:dir_end]
    if len(directory) % 12:
        raise ValueError("directory not a multiple of 12")
    control, data = [], []
    for i in range(0, len(directory), 12):
        entry = directory[i:i + 12]
        tag = entry[:3].decode("ascii", errors="replace")
        try:
            ln = int(entry[3:7])
            st = int(entry[7:12])
        except ValueError as e:
            raise ValueError(f"bad directory entry {entry!r}") from e
        body = buf[base + st: base + st + ln]
        if body.endswith(FT):
            body = body[:-1]
        if tag < "010":
            control.append((tag, body.decode("utf-8", errors="replace")))
        else:
            ind1 = body[0:1].decode("utf-8", errors="replace") or " "
            ind2 = body[1:2].decode("utf-8", errors="replace") or " "
            subs = []
            for piece in body[2:].split(SF):
                if not piece:
                    continue
                subs.append(
                    (piece[:1].decode("utf-8", errors="replace"),
                     decode_value(piece[1:]))
                )
            data.append((tag, ind1, ind2, subs))
    return leader, control, data


def split_records(stream: bytes) -> List[bytes]:
    """Split a concatenated MARC file into per-record byte slices using the
    leader's record-length bytes, falling back to the record terminator when
    the length field is corrupt (the permissive-reader recovery)."""
    out, pos, n = [], 0, len(stream)
    while pos < n:
        if n - pos < 24:
            break
        try:
            ln = int(stream[pos:pos + 5])
        except ValueError:
            nxt = stream.find(RT, pos)
            if nxt < 0:
                break
            ln = nxt - pos + 1
        if ln <= 0:
            break
        out.append(stream[pos:pos + ln])
        pos += ln
    return out


def raw_record_id(buf: bytes) -> Optional[str]:
    """Cheap 001 extraction from directory + payload WITHOUT a full parse —
    the RawRecord.getRecordId project-then-parse discipline
    (RawRecord.java:124-160): read only the first directory entry's slice."""
    try:
        base = int(buf[12:17])
        directory = buf[24:buf.find(FT)]
        for i in range(0, len(directory) - 11, 12):
            if directory[i:i + 3] == b"001":
                ln = int(directory[i + 3:i + 7])
                st = int(directory[i + 7:i + 12])
                return (
                    buf[base + st: base + st + ln]
                    .rstrip(FT).decode("utf-8", errors="replace")
                )
    except (ValueError, IndexError):
        return None
    return None


# ---------------------------------------------------------------------------
# DataFrame surfaces
# ---------------------------------------------------------------------------


def read_marc_binary(binary_df: DataFrame,
                     path_col: str = "path",
                     content_col: str = "content",
                     marc8: str = "never") -> DataFrame:
    """(path, content) rows (e.g. ``spark.read.format('binaryFile')``) ->
    one MARC_SCHEMA row per record (+ path, per-file seq, parse_error).
    Malformed records become quarantine rows with ``parse_error`` set and
    null leader — never an exception (permissive semantics).

    ``marc8="auto"`` enables MARC-8/ANSEL -> Unicode conversion for
    records whose leader/09 is not ``'a'`` (see :func:`decode_record`),
    the ``to_utf_8`` reader config of the reference."""
    import pandas as pd

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                for seq, raw in enumerate(split_records(bytes(content))):
                    rid = raw_record_id(raw)
                    cerrs: list = []
                    try:
                        leader, control, data = decode_record(
                            raw, marc8, charset_errors=cerrs)
                        # charset notes are a SOFT quarantine: the decoded
                        # record still flows (permissive posture), but
                        # parse_error marks it so `parse_error IS NULL`
                        # keeps selecting clean records
                        note = "; ".join(dict.fromkeys(cerrs)) or None
                        rows.append(
                            (path, seq, note, rid or "", leader, control,
                             data)
                        )
                    except ValueError as e:
                        rows.append(
                            (path, seq, str(e), rid or "", None, None, None)
                        )
            yield pd.DataFrame(
                rows,
                columns=["path", "seq", "parse_error", "record_id",
                         "leader", "controlfields", "datafields"],
            )

    return binary_df.select(path_col, content_col).mapInPandas(
        parse, schema=RECORDS_SCHEMA
    )


def raw_record_ids(binary_df: DataFrame,
                   path_col: str = "path",
                   content_col: str = "content") -> DataFrame:
    """(path, seq, record_id, n_bytes) without full parse — the lazy
    RawRecordReader projection (column pruning for binary payloads)."""
    import pandas as pd

    def ids(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                for seq, raw in enumerate(split_records(bytes(content))):
                    rows.append((path, seq, raw_record_id(raw), len(raw)))
            yield pd.DataFrame(
                rows, columns=["path", "seq", "record_id", "n_bytes"]
            )

    return binary_df.select(path_col, content_col).mapInPandas(
        ids, schema="path string, seq int, record_id string, n_bytes long"
    )


def record_to_json(leader: str, controlfields, datafields) -> str:
    """MARC-in-JSON rendering (MarcUtils.getRecordAsJsonStr,
    MarcUtils.java:1619-1691 family)."""
    return json.dumps(
        {
            "leader": leader,
            "fields": [
                {t: d} for t, d in (controlfields or [])
            ] + [
                {
                    t: {
                        "ind1": i1,
                        "ind2": i2,
                        "subfields": [{c: v} for c, v in subs],
                    }
                }
                for t, i1, i2, subs in (datafields or [])
            ],
        },
        ensure_ascii=False,
        sort_keys=False,
    )


def records_to_marc_json(df: DataFrame) -> DataFrame:
    """MARC_SCHEMA rows -> (record_id, marc_json string) via native
    to_json on the struct (the JSON export sink)."""
    return df.select(
        "record_id",
        F.to_json(
            F.struct("leader", "controlfields", "datafields")
        ).alias("marc_json"),
    )


# ---------------------------------------------------------------------------
# MARC-in-JSON reader (MarcHandler.java:423-424 MarcJsonReader analog)
# ---------------------------------------------------------------------------


def parse_marc_json(s: str):
    """One MARC-in-JSON object (the public marc-in-json convention:
    ``{"leader": ..., "fields": [{"001": "..."},
    {"245": {"ind1": ..., "ind2": ..., "subfields": [{"a": ...}]}}]}``) ->
    (leader, controlfields, datafields). Raises ValueError on malformed
    input (the caller quarantines)."""
    try:
        obj = json.loads(s)
    except json.JSONDecodeError as e:
        raise ValueError(f"bad json: {e}") from e
    if not isinstance(obj, dict) or "leader" not in obj:
        raise ValueError("not a marc-in-json object (no leader)")
    control, data = [], []
    for fld in obj.get("fields", []):
        if not isinstance(fld, dict) or len(fld) != 1:
            raise ValueError(f"bad field entry: {fld!r}")
        tag, body = next(iter(fld.items()))
        if isinstance(body, str):
            control.append((tag, body))
        elif isinstance(body, dict):
            subs = []
            for sf in body.get("subfields", []):
                code, value = next(iter(sf.items()))
                subs.append((code, value))
            data.append(
                (tag, body.get("ind1", " "), body.get("ind2", " "), subs)
            )
        else:
            raise ValueError(f"bad field body for {tag}: {body!r}")
    return obj["leader"], control, data


def read_marc_json(json_df: DataFrame, json_col: str = "marc_json",
                   path_col: str | None = None) -> DataFrame:
    """DataFrame with one MARC-in-JSON string per row -> MARC_SCHEMA rows
    (+ path, seq, parse_error quarantine, like the binary reader). The
    reference reads this format via ``new MarcJsonReader(in)``
    (MarcHandler.java:423-424); here the JSON lines typically come from
    ``spark.read.text`` over .json/.ndjson dumps."""
    import pandas as pd

    cols = [json_col] + ([path_col] if path_col else [])

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for i, rec in enumerate(pdf[json_col]):
                path = pdf[path_col].iloc[i] if path_col else None
                try:
                    leader, control, data = parse_marc_json(rec)
                    rid = next(
                        (d for t, d in control if t == "001"), ""
                    ).strip()
                    rows.append((path, i, None, rid, leader, control, data))
                except ValueError as e:
                    rows.append((path, i, str(e), "", None, None, None))
            yield pd.DataFrame(
                rows,
                columns=["path", "seq", "parse_error", "record_id",
                         "leader", "controlfields", "datafields"],
            )

    return json_df.select(*cols).mapInPandas(parse, schema=RECORDS_SCHEMA)


# ---------------------------------------------------------------------------
# MARCXML render + reader (MarcHandler.java:421-422 MarcUnprettyXmlReader,
# MarcUtils.getRecordAsMarcXmlStr MarcUtils.java:1619-1691)
# ---------------------------------------------------------------------------

_MARCXML_NS = "http://www.loc.gov/MARC21/slim"


def record_to_xml(leader: str, controlfields, datafields,
                  with_ns: bool = True) -> str:
    """Record -> MARCXML string (the public MARC21-slim schema: record >
    leader | controlfield@tag | datafield@tag@ind1@ind2 > subfield@code)."""
    from xml.sax.saxutils import escape, quoteattr

    ns = f' xmlns="{_MARCXML_NS}"' if with_ns else ""
    parts = [f"<record{ns}>", f"<leader>{escape(leader or '')}</leader>"]
    for tag, d in (controlfields or []):
        parts.append(
            f"<controlfield tag={quoteattr(tag)}>{escape(d or '')}"
            "</controlfield>"
        )
    for tag, i1, i2, subs in (datafields or []):
        parts.append(
            f"<datafield tag={quoteattr(tag)} ind1={quoteattr(i1 or ' ')}"
            f" ind2={quoteattr(i2 or ' ')}>"
        )
        for code, value in (subs or []):
            parts.append(
                f"<subfield code={quoteattr(code)}>{escape(value or '')}"
                "</subfield>"
            )
        parts.append("</datafield>")
    parts.append("</record>")
    return "".join(parts)


def records_to_marc_xml(df: DataFrame) -> DataFrame:
    """MARC_SCHEMA rows -> (record_id, marc_xml string): the XML export
    sink (``fullrecord = FullRecordAsXML``, SolrIndexer.java:922-946)."""
    import pandas as pd

    def render(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for rid, leader, control, data in zip(
                pdf["record_id"], pdf["leader"], pdf["controlfields"],
                pdf["datafields"],
            ):
                # Arrow hands array columns to pandas as numpy arrays,
                # whose truthiness is ambiguous — compare against None
                control = control if control is not None else []
                data = data if data is not None else []
                control_t = [(c["tag"], c["data"]) for c in control]
                data_t = [
                    (d["tag"], d["ind1"], d["ind2"],
                     [(s["code"], s["value"])
                      for s in (d["subfields"]
                                if d["subfields"] is not None else [])])
                    for d in data
                ]
                out.append((rid, record_to_xml(leader, control_t, data_t)))
            yield pd.DataFrame(out, columns=["record_id", "marc_xml"])

    return df.select(
        "record_id", "leader", "controlfields", "datafields"
    ).mapInPandas(render, schema="record_id string, marc_xml string")


def _local(tag: str) -> str:
    """Strip an XML namespace from an element tag."""
    return tag.rsplit("}", 1)[-1]


def parse_marc_xml(xml_text: str):
    """MARCXML string (a single <record> or a <collection> of records,
    namespaced or not, pretty-printed or not — the whitespace tolerance of
    ``MarcUnprettyXmlReader``, MarcUnprettyXmlReader.java:1-66) ->
    list of (leader, controlfields, datafields). Raises ValueError on
    malformed XML."""
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError as e:
        raise ValueError(f"bad xml: {e}") from e
    if _local(root.tag) == "record":
        recs = [root]
    else:
        recs = [el for el in root.iter() if _local(el.tag) == "record"]
        if not recs:
            raise ValueError("no <record> elements")
    out = []
    for rec in recs:
        leader, control, data = "", [], []
        for el in rec:
            name = _local(el.tag)
            if name == "leader":
                # pretty-printers pad text nodes; leader is fixed-width so
                # strip the decorative whitespace only at the ends
                leader = (el.text or "").strip("\n\r\t")
            elif name == "controlfield":
                control.append((el.get("tag", ""), el.text or ""))
            elif name == "datafield":
                subs = [
                    (sf.get("code", ""), sf.text or "")
                    for sf in el
                    if _local(sf.tag) == "subfield"
                ]
                data.append(
                    (el.get("tag", ""), el.get("ind1", " ") or " ",
                     el.get("ind2", " ") or " ", subs)
                )
        out.append((leader, control, data))
    return out


def read_marc_xml(xml_df: DataFrame, xml_col: str = "marc_xml",
                  path_col: str | None = None) -> DataFrame:
    """DataFrame with MARCXML strings (one record or a whole collection
    document per row — e.g. ``spark.read.format('binaryFile')`` +
    ``decode``, or wholetext text reads) -> MARC_SCHEMA rows (+ path, seq,
    parse_error quarantine)."""
    import pandas as pd

    cols = [xml_col] + ([path_col] if path_col else [])

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for i, doc in enumerate(pdf[xml_col]):
                path = pdf[path_col].iloc[i] if path_col else None
                try:
                    for seq, (leader, control, data) in enumerate(
                        parse_marc_xml(doc)
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

    return xml_df.select(*cols).mapInPandas(parse, schema=RECORDS_SCHEMA)


def sniff_marc_format(path: str | None, head: bytes) -> str:
    """``"xml" | "json" | "marc21"`` for one input, the reference's
    dispatch rule (MarcHandler.java:367-370 extension check, :400-415
    stdin mark/read/reset first-byte check): filename extension wins when
    present; otherwise the first non-whitespace byte — ``<`` is XML, ``{``
    is JSON, anything else is binary MARC21."""
    lc = (path or "").lower()
    if lc.endswith(".xml"):
        return "xml"
    if lc.endswith(".json"):
        return "json"
    if not lc.endswith((".mrc", ".marc")):
        if head.startswith(b"\xef\xbb\xbf"):  # UTF-8 BOM
            head = head[3:]
        first = head.lstrip(b" \t\r\n")[:1]
        if first == b"<":
            return "xml"
        if first == b"{":
            return "json"
    return "marc21"


def _split_json_objects(text: str) -> List[str]:
    """Split a stream of concatenated/ndjson JSON objects into one string
    per object (string-aware brace scan — the MarcJsonReader consumes the
    same concatenated-object stream via its tokenizer)."""
    out: List[str] = []
    depth = 0
    start = -1
    in_str = esc = False
    for i, ch in enumerate(text):
        if in_str:
            if esc:
                esc = False
            elif ch == "\\":
                esc = True
            elif ch == '"':
                in_str = False
            continue
        if ch == '"':
            in_str = True
        elif ch == "{":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0 and start >= 0:
                out.append(text[start:i + 1])
                start = -1
    if depth > 0 and start >= 0:
        out.append(text[start:])  # truncated trailer -> quarantine row
    return out


def read_marc_any(binary_df: DataFrame, path_col: str = "path",
                  content_col: str = "content",
                  marc8: str = "never") -> DataFrame:
    """Format-sniffed reader: (path, content) rows from a MIXED directory
    of binary MARC / MARCXML / MARC-JSON files -> MARC_SCHEMA rows in one
    pass. Per-file dispatch via :func:`sniff_marc_format`, so each file's
    parse is independent (one task per batch of files, same parallelism
    shape as :func:`read_marc_binary`); malformed payloads quarantine with
    ``parse_error`` set, never an exception."""
    import pandas as pd

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                raw = bytes(content)
                fmt = sniff_marc_format(path, raw[:64])
                if fmt == "marc21":
                    for seq, rec in enumerate(split_records(raw)):
                        rid = raw_record_id(rec)
                        try:
                            leader, control, data = decode_record(rec, marc8)
                            rows.append((path, seq, None, rid or "",
                                         leader, control, data))
                        except ValueError as e:
                            rows.append((path, seq, str(e), rid or "",
                                         None, None, None))
                    continue
                text = raw.decode("utf-8", errors="replace")
                if fmt == "xml":
                    try:
                        for seq, (leader, control, data) in enumerate(
                                parse_marc_xml(text)):
                            rid = next((d for t, d in control if t == "001"),
                                       "").strip()
                            rows.append((path, seq, None, rid,
                                         leader, control, data))
                    except ValueError as e:
                        rows.append((path, 0, str(e), "", None, None, None))
                else:
                    for seq, obj in enumerate(_split_json_objects(text)):
                        try:
                            leader, control, data = parse_marc_json(obj)
                            rid = next((d for t, d in control if t == "001"),
                                       "").strip()
                            rows.append((path, seq, None, rid,
                                         leader, control, data))
                        except ValueError as e:
                            rows.append((path, seq, str(e), "",
                                         None, None, None))
            yield pd.DataFrame(
                rows,
                columns=["path", "seq", "parse_error", "record_id",
                         "leader", "controlfields", "datafields"],
            )

    return binary_df.select(path_col, content_col).mapInPandas(
        parse, schema=RECORDS_SCHEMA)


def encode_record_split(leader: str, controlfields, datafields,
                        threshold: int = 70_000,
                        fields_to_split: str = r"9..") -> List[bytes]:
    """Split-stream serialization — MarcSplitStreamWriter
    (core/src/org/solrmarc/marcoverride/MarcSplitStreamWriter.java:45-156):
    ISO 2709 caps a record at 99,999 bytes, so a record whose repeated
    item fields (typically the 9xx) would overflow is written as SEVERAL
    physical records. Every chunk repeats the control fields and all
    non-split data fields; the split-tag fields are dealt out in original
    order until each chunk's data section reaches ``threshold`` bytes.
    The reader side reassembles them (MarcCombiningReader ->
    operators/marc_merge.py:combine_partials), so split -> combine is the
    identity.

    Returns the list of encoded chunks (one element when nothing needs
    splitting — including when the record has NO split-tag fields, which
    still must emit one record, unlike a naive chunker).
    """
    import re as _re

    tag_re = _re.compile(fields_to_split)
    keep = [f for f in datafields if not tag_re.fullmatch(f[0])]
    split = [f for f in datafields if tag_re.fullmatch(f[0])]

    def field_len(f) -> int:
        tag, ind1, ind2, subs = f
        n = 2  # indicators
        for code, value in subs:
            n += 2 + len((value or "").encode("utf-8"))
        return n + 1  # field terminator

    base_len = sum(len(d.encode("utf-8")) + 1 for _, d in controlfields)
    base_len += sum(field_len(f) for f in keep)

    chunks: List[bytes] = []
    i = 0
    while True:
        batch = []
        size = base_len
        # the reference writes at least one split field per chunk even
        # when base_len already exceeds the threshold (its while guard
        # checks BEFORE adding, after having written the fixed part)
        while i < len(split) and size < threshold:
            batch.append(split[i])
            size += field_len(split[i])
            i += 1
        if i < len(split) and not batch:
            # divergence from the reference: when the fixed part alone
            # exceeds the threshold its writer loop would never advance
            # (MarcSplitStreamWriter.java:102 re-checks `previous <
            # recordThreshhold` without progress); force one split field
            # per chunk so the writer always terminates
            batch.append(split[i])
            i += 1
        chunks.append(encode_record(leader, controlfields, keep + batch))
        if i >= len(split):
            break
    return chunks
