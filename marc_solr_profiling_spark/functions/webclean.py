"""Web-corpus hygiene operators beyond the reference's surface: URL
canonicalization + URL-level dedup, PII redaction, C4 line-level quality
filtering (Raffel et al. 2020, "Exploring the Limits of Transfer Learning",
§2.2), and cross-corpus duplicated-line removal (Wenzek et al. 2020, CCNet
§3.1). These are the pre-index steps a Common-Crawl-scale training-data
pipeline runs before the text ever reaches the tokenizer; the reference
engine profiles already-curated records, so there is no Java counterpart —
the cited papers define the semantics.

Scale posture: every operator here is a pure-column expression or a single
keyed shuffle. Nothing leaves the JVM, nothing collects, and the only
groupBys key on short derived values (canonical URL, 64-bit line hash) —
never on document text.
"""
from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# URL canonicalization (RFC 3986 §6 normalization + the tracking-param and
# www-strip conventions used by web-crawl dedup, cf. SURT canonicalization)
# ---------------------------------------------------------------------------

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"
#: query params dropped before comparison — pure click-tracking noise
TRACKING_PARAM_RE = r"^(utm_[a-z0-9_]+|fbclid|gclid|ref)="


def canonicalize_url_expr(url) -> Column:
    """Canonical form of an http(s) URL as a pure column expression:

    - scheme and host lowercased (RFC 3986 §6.2.2.1)
    - default port stripped (``:80`` for http, ``:443`` for https, §6.2.3)
    - leading ``www.`` stripped from the host (crawl-dedup convention)
    - trailing slashes stripped from the path; empty path -> ``/``
    - tracking params (:data:`TRACKING_PARAM_RE`) and empty params dropped,
      the rest sorted bytewise and rejoined (param order is not semantic)
    - fragment dropped (never sent to the server, §3.5)

    Non-URL strings (no ``scheme://`` match) pass through unchanged so the
    expression is total. Everything stays in whole-stage codegen.
    """
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, _URL_RE, 1))
    host = F.lower(F.regexp_extract(u, _URL_RE, 2))
    host = (
        F.when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .otherwise(host)
    )
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_replace(F.regexp_extract(u, _URL_RE, 3), "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    raw_q = F.regexp_extract(u, _URL_RE, 4)            # includes leading '?'
    params = F.filter(
        F.split(F.substr(raw_q, F.lit(2), F.length(raw_q)), "&"),
        lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RE),
    )
    query = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(F.array_sort(params), "&"))
    ).otherwise(F.lit(""))
    canon = F.concat(scheme, F.lit("://"), host, path, query)
    return F.when(scheme == "", u).otherwise(canon)


def url_dedup(df: DataFrame, url_col: str = "url", key_col: str = "doc_id",
              ts_col: Optional[str] = None) -> DataFrame:
    """URL-level exact dedup: group on the canonical URL, keep one winner
    per group (lowest key, or the LATEST ``ts_col`` breaking ties by lowest
    key — the crawl convention of keeping the freshest capture).

    Returns one row per canonical URL: ``canonical_url, n_urls,
    n_raw_variants, kept_<key>``. One shuffle, keyed on the canonical URL
    string (bounded length); at 10^12 rows this is the same shape as the
    exact-dedup hash groupBy in operators/dedup.py — AQE handles the
    mega-host skew the same way.
    """
    canon = df.select(
        canonicalize_url_expr(url_col).alias("canonical_url"),
        F.col(url_col).alias("_raw"), F.col(key_col),
        *([F.col(ts_col)] if ts_col else []),
    )
    if ts_col:
        winner = F.expr(
            f"max_by({key_col}, struct({ts_col} AS a, -{key_col} AS b))"
        ).alias(f"kept_{key_col}")
    else:
        winner = F.min(key_col).alias(f"kept_{key_col}")
    return canon.groupBy("canonical_url").agg(
        F.count("*").alias("n_urls"),
        F.countDistinct("_raw").alias("n_raw_variants"),
        winner,
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

#: (tag, pattern) in application order. Patterns are deliberately RE2-safe
#: (no backrefs/lookaround) so an independent engine can reproduce them.
PII_PATTERNS = (
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("IP", r"\b\d{1,3}(\.\d{1,3}){3}\b"),
    ("PHONE", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
)


def redact_pii(df: DataFrame, text_col: str = "text",
               key_col: str = "doc_id") -> DataFrame:
    """Replace emails, IPv4 addresses and NANP-style phone numbers with
    ``<EMAIL>``/``<IP>``/``<PHONE>`` tokens and count each class BEFORE
    redaction. Order matters (an email's local part can contain digits and
    dots): emails are counted/replaced first, so the IP pass never sees
    them. Pure ``regexp_count``/``regexp_replace`` — JVM-side, no UDF.

    Returns ``<key>, n_email, n_ip, n_phone, redacted``.
    """
    # counts must be taken on the text as seen by THAT stage's replace, so
    # build the chain explicitly: count_i applies to the (i-1)-times-redacted
    # text, then replace_i produces the input of stage i+1.
    cur = F.col(text_col)
    sel = [F.col(key_col)]
    for tag, pat in PII_PATTERNS:
        sel.append(F.regexp_count(cur, F.lit(pat)).cast("long")
                   .alias(f"n_{tag.lower()}"))
        cur = F.regexp_replace(cur, pat, f"<{tag}>")
    sel.append(cur.alias("redacted"))
    return df.select(*sel)


# ---------------------------------------------------------------------------
# C4 line-level quality filter (Raffel et al. 2020 §2.2)
# ---------------------------------------------------------------------------

def c4_line_filter(docs: DataFrame, text_col: str = "text",
                   key_col: str = "doc_id", min_words: int = 3,
                   blacklist: Sequence[str] = ("javascript", "cookie",
                                               "lorem ipsum"),
                   min_kept_lines: int = 2) -> DataFrame:
    """The C4 line-then-document gate: a LINE survives iff it ends in
    terminal punctuation (``. ! ? "``), has >= ``min_words`` whitespace
    words, and contains no blacklist needle (case-insensitive); the
    DOCUMENT survives iff >= ``min_kept_lines`` lines survive. (C4 uses
    min_words=5 and a sentence minimum of 3; both are knobs here because
    the synthetic corpus has shorter lines.)

    Implemented as one ``split`` + higher-order ``filter`` per row — no
    shuffle at all, the whole gate is map-side. Returns ``<key>, n_lines,
    n_kept, kept, clean_chars`` where ``clean_chars`` is the length of the
    newline-rejoined surviving text (what the next pipeline stage would
    ingest).
    """
    lines = F.filter(F.split(F.col(text_col), "\n"),
                     lambda l: F.trim(l) != "")
    lo = lambda l: F.lower(F.trim(l))  # noqa: E731
    keep = lambda l: (  # noqa: E731
        F.trim(l).rlike(r'[.!?"]$')
        & (F.size(F.split(F.trim(l), r"\s+")) >= min_words)
        & ~_any_of([lo(l).contains(b.lower()) for b in blacklist])
    )
    kept_lines = F.filter(lines, keep)
    return docs.select(
        F.col(key_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept_lines).cast("long").alias("n_kept"),
        (F.size(kept_lines) >= min_kept_lines).alias("kept"),
        F.length(F.array_join(F.transform(kept_lines, F.trim), "\n"))
        .cast("long").alias("clean_chars"),
    )


def _any_of(cols) -> Column:
    acc = cols[0]
    for c in cols[1:]:
        acc = acc | c
    return acc


# ---------------------------------------------------------------------------
# Cross-corpus duplicated-line removal (CCNet, Wenzek et al. 2020 §3.1)
# ---------------------------------------------------------------------------

def duplicate_line_stats(docs: DataFrame, text_col: str = "text",
                         key_col: str = "doc_id",
                         min_docs: int = 2) -> DataFrame:
    """Boilerplate detection by line frequency: a normalized (trimmed,
    lowercased) line that appears in >= ``min_docs`` DISTINCT documents is
    boilerplate (cookie banners, nav bars, copyright footers). Returns per
    document ``<key>, n_lines, n_dup, dup_frac``.

    Scale shape: lines are exploded once, then ALL heavy stages key on
    ``xxhash64(line)`` — the shuffle moves 8-byte hashes, never line text
    (CCNet hashes for exactly this reason; a 2^-64 collision marks one
    extra line as boilerplate, which the paper accepts). The per-line df
    count is a partial-aggregated groupBy, and the join back to documents
    is hash-on-hash. No window functions, no driver materialization.
    """
    lines = docs.select(
        F.col(key_col),
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    ).select(
        key_col, F.xxhash64(F.lower(F.trim("line"))).alias("h"),
        (F.trim("line") != "").alias("nonempty"),
    ).filter("nonempty")
    boiler = (
        lines.groupBy("h")
        .agg(F.countDistinct(key_col).alias("ndocs"))
        .filter(F.col("ndocs") >= min_docs)
        .select("h", F.lit(True).alias("is_dup"))
    )
    tagged = lines.join(boiler, "h", "left")
    return tagged.groupBy(key_col).agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.coalesce(F.col("is_dup").cast("long"), F.lit(0)))
        .cast("long").alias("n_dup"),
        F.round(
            F.sum(F.coalesce(F.col("is_dup").cast("double"), F.lit(0.0)))
            / F.count("*"), 6
        ).alias("dup_frac"),
    )


# ---------------------------------------------------------------------------
# Cleaning-cascade funnel (the RefinedWeb / FineWeb pipeline shape)
# ---------------------------------------------------------------------------

def cleaning_funnel(docs: DataFrame, key_col: str = "doc_id",
                    text_col: str = "text", url_col: Optional[str] = "url",
                    stopwords: Optional[Sequence[str]] = None,
                    **gopher_thresholds) -> DataFrame:
    """The production cleaning cascade as ONE declarative plan with a
    per-stage survivor funnel (the shape of RefinedWeb / FineWeb: URL-level
    dedup first because it is cheapest per byte, quality filtering next,
    content dedup last so it only hashes survivors):

      1. ``url_dedup``   one winner (min key) per canonical URL
      2. ``quality``     Gopher rule gate (textstats.gopher_quality_flags)
      3. ``exact_dedup`` one winner (min key) per md5(text)

    Returns ``(stage_order, stage, n_in, n_kept, n_dropped)`` — four rows
    (three if ``url_col`` is None). Stage membership flows forward as
    key-only semi-joins, so document text is scanned where a stage needs it
    but never shuffled; the four counts land in one job via a cross-join of
    single-row aggregates (each side is one row — broadcast by
    construction).
    """
    from ..operators import _cache
    from .textstats import GOPHER_RULES, gopher_quality_flags

    # survivor key sets are persisted: each stage's n_kept count AND the
    # next stage's semi-join both consume them, and the expensive upstream
    # (the Gopher kernel) must run once, not once per funnel row
    _cache.begin("cleaning_funnel")
    stages = []  # (name, survivors key-only DF, persisted)
    cur = docs
    if url_col:
        winners = _cache.hold("cleaning_funnel", (
            cur.groupBy(canonicalize_url_expr(url_col).alias("cu"))
            .agg(F.min(key_col).alias(key_col))
            .select(key_col)
        ))
        stages.append(("url_dedup", winners))
        cur = docs.join(winners, key_col, "left_semi")
    flags = gopher_quality_flags(
        cur, key_col=key_col, text_col=text_col,
        stopwords=list(stopwords) if stopwords is not None else None,
        **gopher_thresholds)
    rejected = F.lit(False)
    for r in GOPHER_RULES:
        rejected = rejected | F.col(r)
    stages.append(("quality", _cache.hold(
        "cleaning_funnel", flags.filter(~rejected).select(key_col))))
    cur = cur.join(stages[-1][1], key_col, "left_semi")
    stages.append((
        "exact_dedup",
        cur.groupBy(F.md5(F.col(text_col)).alias("h"))
        .agg(F.min(key_col).alias(key_col)).select(key_col),
    ))

    counts = docs.agg(F.count("*").alias("n_0"))
    for i, (_, surv) in enumerate(stages):
        counts = counts.crossJoin(surv.agg(F.count("*").alias(f"n_{i + 1}")))
    names = ["input"] + [name for name, _ in stages]
    # row i: (order, name, n_in = previous stage's survivors, n_kept = own)
    stack_args = ", ".join(
        f"{i + 1}, '{name}', n_{max(i - 1, 0)}, n_{i}"
        for i, name in enumerate(names)
    )
    return counts.selectExpr(
        f"stack({len(names)}, {stack_args}) AS "
        "(stage_order, stage, n_in, n_kept)"
    ).select(
        F.col("stage_order").cast("int").alias("stage_order"),
        "stage",
        F.col("n_in").cast("long").alias("n_in"),
        F.col("n_kept").cast("long").alias("n_kept"),
        (F.col("n_in") - F.col("n_kept")).cast("long").alias("n_dropped"),
    )


def remove_duplicate_lines(docs: DataFrame, text_col: str = "text",
                           key_col: str = "doc_id") -> DataFrame:
    """Corpus-wide duplicated-line REMOVAL — the mutation step of the
    CCNet §3.1 paragraph dedup (``duplicate_line_stats`` is its
    measurement twin): every normalized (trimmed, lowercased) line keeps
    exactly its FIRST occurrence in corpus order (min ``(key, position)``)
    and every later instance is deleted from its document. Blank lines
    are dropped outright (whitespace normalization). Returns one row per
    input document: ``(key, n_lines, n_kept, clean_md5)`` with
    ``clean_md5`` the md5 of the surviving lines re-joined by ``\\n``
    (empty string when nothing survives) — the pinned-digest output
    contract of ``redact_pii``.

    Scale shape: lines explode once; the first-occurrence winner per
    line is a groupBy-min on ``xxhash64(line)`` (8-byte keys, line text
    never shuffles in the heavy stage — the duplicate_line_stats
    rationale); the join back is hash+instance equality; reassembly is
    the only stage that moves surviving text, one groupBy over the
    (already reduced) kept lines. A 2^-64 hash collision deletes one
    extra line, the CCNet trade. The exploded lines frame feeds three
    consumers (winner election, keep join, totals), so it is persisted
    under the ``_cache`` generation protocol — otherwise the scan +
    explode re-runs per consumer (the lsh_jaccard survivor-persist
    pattern).
    """
    from ..operators import _cache

    _cache.begin("line_dedup_clean")
    lines = _cache.hold("line_dedup_clean", docs.select(
        F.col(key_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).filter(F.trim("line") != "").select(
        key_col, "pos", "line",
        F.xxhash64(F.lower(F.trim("line"))).alias("h"),
    ))
    winners = lines.groupBy("h").agg(
        F.min(F.struct(key_col, "pos")).alias("w"))
    kept = lines.join(winners, "h").filter(
        (F.col(key_col) == F.col("w")[key_col])
        & (F.col("pos") == F.col("w.pos"))
    )
    rebuilt = kept.groupBy(key_col).agg(
        F.count("*").cast("long").alias("n_kept"),
        F.md5(F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ), "\n")).alias("clean_md5"),
    )
    totals = lines.groupBy(key_col).agg(
        F.count("*").cast("long").alias("n_lines"))
    return docs.select(key_col).join(totals, key_col, "left").join(
        rebuilt, key_col, "left"
    ).select(
        key_col,
        F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce("clean_md5", F.md5(F.lit(""))).alias("clean_md5"),
    )


def host_expr(url) -> Column:
    """Lowercased host of an http(s) URL, default-port- and ``www.``-
    stripped — the grouping key for domain-level corpus stages. Pure
    regexp expressions (whole-stage codegen)."""
    u = F.col(url) if isinstance(url, str) else url
    host = F.lower(F.regexp_extract(u, _URL_RE, 2))
    host = F.regexp_replace(host, r":\d+$", "")
    return F.regexp_replace(host, r"^www\.", "")


def domain_stats(df: DataFrame, url_col: str = "url",
                 key_col: str = "doc_id",
                 text_col: Optional[str] = None,
                 blocklist: Sequence[str] = ()) -> DataFrame:
    """Per-domain corpus rollup + blocklist gate — the site-level stage
    (C4 §2.2's "bad domains" filter / the UT1-blocklist pass in
    RefinedWeb, and the per-domain datasheet tables in Dolma): one row
    per host with ``host, n_docs, n_tokens, blocked``.

    A host is blocked when it equals a blocklist entry or is a
    subdomain of one (``host = b OR host LIKE '%.b'`` — the registrable-
    domain convention; a public-suffix-list refinement is data, not
    structure). ``n_tokens`` is 0 when no ``text_col`` is given.

    Scale shape: host extraction is a per-row expression; ONE groupBy on
    the host string; the blocklist is a literal OR-chain (driver-sized
    by definition — UT1 ships ~4M entries, which at that size would move
    to a broadcast semi-join, same plan class as the decontaminate
    probe).
    """
    from .textstats import token_count

    host = host_expr(url_col).alias("host")
    n_tok = (token_count(text_col) if text_col else F.lit(0)).alias("_nt")
    rolled = df.select(host, n_tok).groupBy("host").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("_nt").cast("long").alias("n_tokens"),
    )
    blocked = F.lit(False)
    for b in blocklist:
        lb = b.lower()
        blocked = blocked | (F.col("host") == lb) \
            | F.col("host").endswith("." + lb)
    return rolled.select("host", "n_docs", "n_tokens",
                         blocked.alias("blocked"))
