"""MARC-8 (ANSEL) -> Unicode conversion and record-level unicode
normalization: the analog of the reference's reader-decorator
``MarcTranslatedReader`` (``core/src/org/solrmarc/marc/
MarcTranslatedReader.java:41-130``), which wraps any MarcReader and (a)
converts non-UTF-8 records with marc4j's ``AnselToUnicode`` converter,
(b) applies ICU unicode normalization per the ``marc.unicode_normalize``
config (KC / C / D / KD, parsed at ``MarcHandler.java:256-271``).

The code tables below are the public Library of Congress MARC-8 code
tables (Basic/Extended Latin a.k.a. ANSEL, plus the three single-byte
alternate sets marc4j supports: subscript, superscript, Greek symbols).
MARC-8 places combining diacritics BEFORE their base character;
Unicode places them AFTER — the converter buffers combinings and
reorders (same algorithm as ``AnselToUnicode.convert``).

EACC (the multibyte East-Asian set, ANSI/NISO Z39.64, designations
``ESC $ 1`` / ``ESC $ , 1`` for G0 and ``ESC $ ) 1`` / ``ESC $ - 1``
for G1 — the very encoding of 880 vernacular fields that the
linked-880 projections exist for, MarcUtils.java:310-358): the
MECHANICS are fully implemented — designation parsing, 3-byte code
consumption (controls/space pass through without consuming), G1
high-bit stripping, truncated-triple recovery — so EACC content never
desynchronizes the byte stream.  The code->Unicode TABLE itself is
~16k entries of LOC data (marc4j generates ``EastAsianCodes`` from
LOC's codetables.xml); it is NOT bundled — load one at runtime with
:func:`load_eacc_table`.  Unmapped triples yield U+FFFD and are
COUNTED: :func:`marc8_decode` returns the charset-error note that the
readers surface as a quarantine annotation (``parse_error``), instead
of the pre-round-4 silent replacement.
"""

from __future__ import annotations

import unicodedata

from pyspark.sql import DataFrame

# Extended-Latin (ANSEL) single characters, LOC MARC-8 code table 45.
_ANSEL_CHARS = {
    0xA1: "Ł",  # L with stroke
    0xA2: "Ø",  # O with stroke
    0xA3: "Đ",  # D with crossbar
    0xA4: "Þ",  # thorn (upper)
    0xA5: "Æ",  # AE ligature
    0xA6: "Œ",  # OE ligature
    0xA7: "ʹ",  # soft sign / prime
    0xA8: "·",  # middle dot
    0xA9: "♭",  # musical flat
    0xAA: "®",  # registered
    0xAB: "±",  # plus-minus
    0xAC: "Ơ",  # O-hook (upper)
    0xAD: "Ư",  # U-hook (upper)
    0xAE: "ʼ",  # alif (modifier apostrophe)
    0xB0: "ʻ",  # ayn (modifier turned comma)
    0xB1: "ł",  # l with stroke
    0xB2: "ø",  # o with stroke
    0xB3: "đ",  # d with crossbar
    0xB4: "þ",  # thorn (lower)
    0xB5: "æ",  # ae ligature
    0xB6: "œ",  # oe ligature
    0xB7: "ʺ",  # hard sign / double prime
    0xB8: "ı",  # dotless i
    0xB9: "£",  # pound sterling
    0xBA: "ð",  # eth
    0xBC: "ơ",  # o-hook (lower)
    0xBD: "ư",  # u-hook (lower)
    0xC0: "°",  # degree
    0xC1: "ℓ",  # script l
    0xC2: "℗",  # sound recording copyright
    0xC3: "©",  # copyright
    0xC4: "♯",  # musical sharp
    0xC5: "¿",  # inverted question mark
    0xC6: "¡",  # inverted exclamation
    0xC7: "ß",  # eszett (2004 addition)
    0xC8: "€",  # euro (2004 addition)
}

# Combining diacritics (MARC-8 prefixes them; Unicode suffixes them).
_ANSEL_COMBINING = {
    0xE0: "̉",  # hook above
    0xE1: "̀",  # grave
    0xE2: "́",  # acute
    0xE3: "̂",  # circumflex
    0xE4: "̃",  # tilde
    0xE5: "̄",  # macron
    0xE6: "̆",  # breve
    0xE7: "̇",  # dot above
    0xE8: "̈",  # diaeresis
    0xE9: "̌",  # caron (hacek)
    0xEA: "̊",  # ring above
    0xEB: "︠",  # ligature, left half
    0xEC: "︡",  # ligature, right half
    0xED: "̕",  # comma above right (high comma, off center)
    0xEE: "̋",  # double acute
    0xEF: "̐",  # candrabindu
    0xF0: "̧",  # cedilla
    0xF1: "̨",  # right hook (ogonek)
    0xF2: "̣",  # dot below
    0xF3: "̤",  # double dot below
    0xF4: "̥",  # ring below
    0xF5: "̳",  # double underscore
    0xF6: "̲",  # underscore
    0xF7: "̦",  # comma below (left hook)
    0xF8: "̜",  # right cedilla (left half ring below)
    0xF9: "̮",  # upadhmaniya (breve below)
    0xFA: "︢",  # double tilde, left half
    0xFB: "︣",  # double tilde, right half
    0xFE: "̓",  # high comma, centered (comma above)
}

# Single-byte alternate graphic sets reachable via ESC (the three
# marc4j's AnselToUnicode handles besides Latin): designation byte ->
# {code -> char}. LOC MARC-8 tables: subscript (ESC b), superscript
# (ESC p), Greek symbols (ESC g); ESC s returns to Basic Latin.
_SUBSCRIPT = {
    0x28: "₍", 0x29: "₎", 0x2B: "₊", 0x2D: "₋",
    **{0x30 + d: chr(0x2080 + d) for d in range(10)},
}
_SUPERSCRIPT = {
    0x28: "⁽", 0x29: "⁾", 0x2B: "⁺", 0x2D: "⁻",
    0x30: "⁰", 0x31: "¹", 0x32: "²", 0x33: "³",
    **{0x30 + d: chr(0x2070 + d) for d in range(4, 10)},
}
_GREEK_SYMBOLS = {0x61: "α", 0x62: "β", 0x63: "γ"}
_ALT_SETS = {0x62: _SUBSCRIPT, 0x70: _SUPERSCRIPT, 0x67: _GREEK_SYMBOLS}

_ESC = 0x1B
NORMALIZE_MODES = {"C": "NFC", "D": "NFD", "KC": "NFKC", "KD": "NFKD"}

#: EACC 3-byte code (b1<<16 | b2<<8 | b3, 7-bit bytes) -> Unicode char.
#: Populated lazily from the BUNDLED LOC code table data
#: (``sources/eacc_data.py``, 15,738 entries — the published MARC-8
#: East-Asian table, see that module's provenance note); 880 vernacular
#: fields in real MARC-8 dumps decode to text instead of quarantining.
#: :func:`load_eacc_table` still overrides/extends for custom tables.
_EACC_CHARS: dict[int, str] = {}
_EACC_LOADED = False


def _ensure_eacc() -> None:
    global _EACC_LOADED
    if not _EACC_LOADED:
        from .eacc_data import eacc_table

        base = eacc_table()
        base.update(_EACC_CHARS)  # explicit loads win over the bundle
        _EACC_CHARS.update(base)
        _EACC_LOADED = True


def load_eacc_table(text: str) -> int:
    """Load an EACC -> Unicode mapping into the converter.  Accepts the
    simple two-column hex format (one mapping per line,
    ``<6-hex-digit EACC code><whitespace><4-6 hex digit UCS>``, ``#``
    comments) that LOC's published codetable data trivially exports to.
    Returns the number of entries loaded.  (AnselToUnicode +
    EastAsianCodes wiring: MarcHandler.java:425-431.)"""
    n = 0
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line:
            continue
        parts = line.split()
        if len(parts) < 2:
            continue
        _EACC_CHARS[int(parts[0], 16)] = chr(int(parts[1], 16))
        n += 1
    return n


def marc8_decode(data: bytes) -> tuple[str, str | None]:
    """Convert one MARC-8 byte string (Basic Latin + ANSEL + the
    single-byte alternate sets + EACC multibyte mechanics) to Unicode,
    reordering prefixed combining marks after their base character
    (``AnselToUnicode.convert`` semantics).  Subfield separators/ASCII
    controls pass through untouched.

    Returns ``(text, charset_error)``: ``charset_error`` is None for a
    clean decode, else a short note counting unmapped EACC triples /
    truncated multibyte codes / unknown escapes — the readers surface it
    as a quarantine annotation instead of letting U+FFFD text flow
    silently."""
    _ensure_eacc()
    out: list[str] = []
    pending: list[str] = []  # buffered combining marks awaiting a base
    alt: dict | None = None  # active alternate single-byte set
    multibyte = False        # EACC mode (ESC $ 1 et al.)
    unmapped_eacc = 0
    truncated = 0
    bad_escape = 0
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        if b == _ESC and i + 1 < n:
            d = data[i + 1]
            if d in _ALT_SETS:  # ESC b / p / g
                alt, multibyte = _ALT_SETS[d], False
                i += 2
                continue
            if d == 0x73:  # ESC s -> Basic Latin
                alt, multibyte = None, False
                i += 2
                continue
            if d == 0x24:  # ESC $ ... : multibyte designations
                # ESC $ 1 (G0), ESC $ , 1 (G0), ESC $ ) 1 / ESC $ - 1 (G1)
                # all designate EACC (MARC-8 spec; marc4j AnselToUnicode
                # tracks the same four forms)
                if i + 2 < n and data[i + 2] == 0x31:
                    alt, multibyte = None, True
                    i += 3
                    continue
                if (i + 3 < n and data[i + 2] in (0x2C, 0x29, 0x2D)
                        and data[i + 3] == 0x31):
                    alt, multibyte = None, True
                    i += 4
                    continue
                bad_escape += 1
                out.append("�")
                i += 2
                continue
            if (d in (0x28, 0x29, 0x2C, 0x2D) and i + 2 < n
                    and data[i + 2] == 0x42):  # ESC ( B etc.: Basic Latin
                alt, multibyte = None, False
                i += 3
                continue
            if (d in (0x28, 0x29, 0x2C, 0x2D) and i + 2 < n
                    and data[i + 2] == 0x45):  # ESC ( E etc.: ANSEL
                alt, multibyte = None, False
                i += 3
                continue
            bad_escape += 1
            out.append("�")
            i += 2
            continue
        if multibyte:
            if b <= 0x20 or b == 0x7F:  # controls + space pass through
                out.append(chr(b))
                i += 1
                continue
            if i + 2 < n and data[i + 1] > 0x20 and data[i + 2] > 0x20 \
                    and _ESC not in (data[i + 1], data[i + 2]):
                code = (((b & 0x7F) << 16)
                        | ((data[i + 1] & 0x7F) << 8)
                        | (data[i + 2] & 0x7F))  # G1 high bits stripped
                ch = _EACC_CHARS.get(code)
                if ch is None:
                    unmapped_eacc += 1
                    ch = "�"
                out.append(ch)
                if pending:
                    out.extend(reversed(pending))
                    pending.clear()
                i += 3
                continue
            # truncated triple (end of field or an escape mid-code):
            # consume the lone byte so the stream cannot desynchronize
            truncated += 1
            out.append("�")
            i += 1
            continue
        if alt is not None and b in alt:
            ch = alt[b]
        elif b < 0x80:
            ch = chr(b)
        elif b in _ANSEL_COMBINING:
            pending.append(_ANSEL_COMBINING[b])
            i += 1
            continue
        elif b in _ANSEL_CHARS:
            ch = _ANSEL_CHARS[b]
        else:
            ch = "�"
        out.append(ch)
        if pending:  # base char emitted: its combinings follow it
            out.extend(reversed(pending))
            pending.clear()
        i += 1
    out.extend(pending)  # trailing orphan combinings kept (marc4j does)
    err = None
    if unmapped_eacc or truncated or bad_escape:
        parts = []
        if unmapped_eacc:
            parts.append(f"{unmapped_eacc} unmapped EACC code(s)")
        if truncated:
            parts.append(f"{truncated} truncated multibyte code(s)")
        if bad_escape:
            parts.append(f"{bad_escape} unknown escape(s)")
        err = "charset: " + ", ".join(parts)
    return "".join(out), err


def marc8_to_unicode(data: bytes) -> str:
    """Text-only view of :func:`marc8_decode` (back-compat surface)."""
    return marc8_decode(data)[0]


def is_utf8_record(leader: str) -> bool:
    """Leader byte 09 = 'a' marks a UTF-8 record (MARC 21 spec; the
    reference reads it via ``Leader.getCharCodingScheme()``,
    ``MarcTranslatedReader.java:95-97``)."""
    return len(leader) > 9 and leader[9] == "a"


def normalize_records(records: DataFrame, mode: str) -> DataFrame:
    """The normalize half of ``MarcTranslatedReader``: apply unicode
    normalization ``mode`` (``"C" | "D" | "KC" | "KD"``, the
    ``marc.unicode_normalize`` values accepted at
    ``MarcHandler.java:256-271``) to every DATA-field subfield value.
    Control fields, indicators and the leader are untouched — the
    reference's loop only rewrites ``DataField`` subfield data
    (``MarcTranslatedReader.java:98-124``).

    Arrow-batched mapInPandas over the full record rows (the per-record
    decorator shape); records already in the requested form come back
    bit-identical, so the pass is idempotent.
    """
    form = NORMALIZE_MODES.get(mode.upper().replace("NF", ""))
    if form is None:
        raise ValueError(
            f"unicode_normalize mode {mode!r}; expected C, D, KC or KD")
    schema = records.schema
    cols = list(records.columns)
    df_ix = cols.index("datafields")

    def kernel(batches):
        norm = unicodedata.normalize
        for pdf in batches:
            if len(pdf) == 0:
                continue
            new_col = []
            for fields in pdf.iloc[:, df_ix]:
                if fields is None:
                    new_col.append(None)
                    continue
                # Arrow hands struct arrays back as numpy object arrays
                # of dicts; subfields may be ndarray, list or None
                new_col.append([
                    {**f, "subfields": None if f["subfields"] is None else [
                        {"code": sf["code"],
                         "value": None if sf["value"] is None
                         else norm(form, sf["value"])}
                        for sf in f["subfields"]
                    ]}
                    for f in fields
                ])
            import pandas as pd

            pdf = pdf.copy()
            pdf[pdf.columns[df_ix]] = pd.Series(
                new_col, index=pdf.index, dtype=object)
            yield pdf

    return records.mapInPandas(kernel, schema=schema)
