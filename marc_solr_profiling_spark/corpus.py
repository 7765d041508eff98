"""Deterministic synthetic web-page corpus generator.

Produces the BASELINE.json input_hint table shape —
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)`` —
seeded and fully deterministic, so extraction has a verifiable fixed point:
``html`` is generated *around* the known ``text`` and the extractor must
recover ``text`` byte-identically per url (the north-rule invariant; the
analog of the reference's mapping-test tier,
``core/test/src/org/solrmarc/testUtils/SolrFieldMappingTest.java:61-123``).

Term distribution is Zipfian over a synthetic vocabulary — the web-text
reality that makes stopword skew a first-class problem for the posting
build (SURVEY.md §7 risk 3).

Generation is distributed: ``spark.range(n)`` -> mapInPandas, so a 10^12-row
corpus is generated partition-parallel with no driver bottleneck.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone
from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WEB_PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

_EPOCH = datetime(2023, 1, 1, tzinfo=timezone.utc)

# Edge-case injections (FIXTURES.md §1): NFC/NFD diacritics, case/number
# compounds, possessives, trailing punct, CJK/RTL, boundary docs.
import unicodedata as _ud

_EDGE_TEXTS = [
    _ud.normalize("NFC", "Hà-tiên voyage"),   # pre-composed
    _ud.normalize("NFD", "Hà-tiên voyage"),   # decomposed (same after fold)
    "WiFi wi-fi MP3-Player ISBN 0-13-110362-8",
    "O'Brien's libraries' choice",
    "word. word, word / [bracketed]",
    "紫禁城宮殿 מבחן mixed",
    "",
    "   ",
    "single",
]


def _vocab(size: int = 10000) -> List[str]:
    """Deterministic vocabulary: common-word prefix + generated tail."""
    base = (
        "the of and to in a is that for it with as on be at by this had not "
        "are but from or have an they which one you were her all she there "
        "would their we him been has when who will more no if out so said "
        "what up its about into than them can only other new some could time"
    ).split()
    words = list(dict.fromkeys(base))
    i = 0
    while len(words) < size:
        h = hashlib.md5(f"vocab{i}".encode()).hexdigest()
        w = "".join(chr(ord("a") + int(c, 16) % 26) for c in h[:3 + i % 6])
        if w not in words:
            words.append(w)
        i += 1
    return words[:size]


def _zipf_cdf(size: int, s: float = 1.07) -> np.ndarray:
    ranks = np.arange(1, size + 1, dtype=np.float64)
    weights = 1.0 / np.power(ranks, s)
    return np.cumsum(weights / weights.sum())


_NAV_ITEM = '<li><a href="/cat/x">menu item one</a></li>'
_SCRIPT_PAD = "var p=document.querySelectorAll('.x');for(var i=0;i<p.length;i++){p[i].d=i;}"


def make_html(text: str, title: str, n_boiler: int = 2) -> bytes:
    """Wrap known text in boilerplate HTML (entities + nav/script/style
    noise) so the extractor has real work; extraction must return ``text``
    exactly — all boilerplate lives inside dropped containers
    (head/script/style/nav/footer), mirroring real page chrome.

    ``n_boiler`` scales the chrome weight: real Common-Crawl pages average
    tens of kilobytes of markup around a few kilobytes of visible text, and
    the extractor's cost is proportional to total markup."""
    body = text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    nav = "<nav><ul>" + _NAV_ITEM * (24 * n_boiler) + "</ul></nav>"
    script = "<script>" + _SCRIPT_PAD * (12 * n_boiler) + "</script>"
    style = "<style>" + ".c{margin:0;padding:0}" * (10 * n_boiler) + "</style>"
    return (
        "<html><head><title>{t}</title>{sc}{st}</head>"
        "<body>{nv}<p>{b}</p>"
        "<footer>&copy; 2023 <ul>" + _NAV_ITEM * (8 * n_boiler) + "</ul></footer>"
        "</body></html>"
    ).format(t=title, sc=script, st=style, nv=nav, b=body).encode("utf-8")


def generate_web_pages(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    partitions: int | None = None,
    vocab_size: int = 10000,
    zipf_s: float = 1.07,
) -> DataFrame:
    """Distributed deterministic corpus: one web page per row.

    Determinism: each row's content depends only on (seed, row id), never on
    partitioning, so the same (seed, n_docs) yields the same table at any
    parallelism level — required for the two-cluster-size scaling evidence.
    """
    vocab = np.array(_vocab(vocab_size), dtype=object)
    cdf = _zipf_cdf(vocab_size, zipf_s)
    n_edge = len(_EDGE_TEXTS)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                rng = np.random.default_rng(seed * 1_000_003 + int(i))
                if i < n_edge:
                    text = _EDGE_TEXTS[int(i)]
                else:
                    # Common-Crawl-shaped body: Zipfian common vocabulary
                    # plus a long tail of near-unique tokens (ids, typos,
                    # codes) — the tail is what keeps the analyzer's
                    # stem/fold path genuinely hot at scale.
                    n_tok = int(rng.integers(80, 700))
                    picks = np.searchsorted(cdf, rng.random(n_tok))
                    words = vocab[picks].copy()
                    n_rare = n_tok // 16
                    if n_rare:
                        pos = rng.integers(0, n_tok, n_rare)
                        rare_ids = rng.integers(0, 2_000_000, n_rare)
                        for p, rid in zip(pos, rare_ids):
                            words[p] = f"Ref{rid:07d}x"
                    text = " ".join(words)
                lang = "en" if (i % 20) else ("de" if (i % 40) else "fr")
                title = f"Page {i}"
                rows.append(
                    (
                        f"https://site{i % 997}.example/p/{i}",
                        _EPOCH + timedelta(seconds=int(i) * 137),
                        make_html(text, title, n_boiler=1 + int(i) % 4),
                        text,
                        lang,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    parts = partitions or spark.sparkContext.defaultParallelism
    return (
        spark.range(0, n_docs, numPartitions=parts)
        .mapInPandas(gen, schema=WEB_PAGES_SCHEMA)
    )


def generate_query_set(n_queries: int = 50, seed: int = 42) -> List[str]:
    """The reference query set (FIXTURES.md §2): 1-term high/low df,
    multi-term, absent terms, edge-case terms. Deterministic."""
    vocab = _vocab(10000)
    rng = np.random.default_rng(seed)
    queries: List[str] = []
    for qi in range(n_queries):
        kind = qi % 5
        if kind == 0:      # high-df single term
            queries.append(vocab[int(rng.integers(0, 20))])
        elif kind == 1:    # low-df single term
            queries.append(vocab[int(rng.integers(5000, 10000))])
        elif kind == 2:    # 2-5 term query
            k = int(rng.integers(2, 6))
            queries.append(" ".join(vocab[int(rng.integers(0, 3000))] for _ in range(k)))
        elif kind == 3:    # absent term
            queries.append(f"zzqx{qi}absent")
        else:              # edge-case terms
            queries.append(["wi-fi", "O'Brien's", "Hà-tiên", "MP3-Player", "voyage"][qi % 5])
    return queries
