"""HTML -> text extraction as a vectorized pandas UDF.

The analog of the reference's record-content extraction
(``MarcUtils.getAllSearchableFields``, ``core/src/org/solrmarc/tools/
MarcUtils.java:178-202`` — "concat of ALL subfields … the catch-all search
text"). For a web page the searchable content is the visible body text:
boilerplate containers (head/script/style/nav/footer) are dropped, tags are
stripped, and HTML entities are unescaped.

The north-rule invariant is byte-identity: for the synthetic corpus, whose
``html`` is generated around a known ``text`` (corpus.py), the extractor must
return that ``text`` exactly — no whitespace normalization is applied, so
even whitespace-only documents round-trip.

Deterministic pure-regex implementation (no HTML-parsing library is
available in the container); entered only through Arrow-batched pandas UDFs.
Per-row, shuffle-free: scales linearly with executors.
"""

from __future__ import annotations

import html as _htmlmod
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Drop entire boilerplate subtrees, then strip remaining tags.
_DROP_BLOCK_RE = re.compile(
    r"<(script|style|head|nav|footer)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_TAG_RE = re.compile(r"<[^>]+>")


def extract_text_from_html(raw: bytes | bytearray | None) -> str | None:
    """Extract visible text from one HTML byte payload."""
    if raw is None:
        return None
    s = bytes(raw).decode("utf-8", errors="replace")
    s = _DROP_BLOCK_RE.sub("", s)
    s = _TAG_RE.sub("", s)
    return _htmlmod.unescape(s)


def extract_text_udf() -> Column:
    """pandas UDF ``binary -> string``: vectorized HTML text extraction."""

    @F.pandas_udf(T.StringType())
    def _extract(col: pd.Series) -> pd.Series:
        return col.map(extract_text_from_html)

    return _extract
