"""Web link graph: anchor/link extraction from raw HTML and PageRank.

The reference profiles a closed record collection; a Common-Crawl corpus is
a GRAPH — links carry ranking signal (anchor text is classic search
relevance input; PageRank the classic authority score). These are the two
graph-side operators a web-scale index build runs next to the posting
build, expressed the Spark-native way:

- link extraction is a per-row Arrow-batched kernel over the same html
  bytes the tokenizer already reads (no extra input pass at the plan
  level: Catalyst shares the scan);
- PageRank is the standard synchronous power iteration as one edge join +
  one grouped sum per round — O(|E|) shuffle keyed on node id, no
  driver-side graph, with ``localCheckpoint`` per round so the logical
  plan does not deepen (the Catalyst re-analysis trap documented at
  ``dedup.py:connected_components``).
"""

from __future__ import annotations

import re
from typing import Iterator
from urllib.parse import urljoin

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HREF_RE = re.compile(
    r"""<a\s[^>]*?href\s*=\s*(?:"([^"]*)"|'([^']*)')[^>]*>(.*?)</a\s*>""",
    re.IGNORECASE | re.DOTALL,
)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def extract_links(pages: DataFrame, url_col: str = "url",
                  html_col: str = "html") -> DataFrame:
    """(url, html) -> one row per ``<a href>`` link: ``(src, dst,
    anchor)``. Relative hrefs resolve against the page url (RFC 3986
    ``urljoin``); ``javascript:``/``mailto:``/fragment-only hrefs are
    dropped; anchor text is tag-stripped and whitespace-collapsed.
    Arrow-batched ``mapInPandas`` — per-row, shuffle-free.
    """
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for src, html in zip(pdf[url_col], pdf[html_col]):
                if html is None:
                    continue
                s = bytes(html).decode("utf-8", errors="replace")
                for m in _HREF_RE.finditer(s):
                    href = (m.group(1) or m.group(2) or "").strip()
                    if (not href or href.startswith("#")
                            or href.lower().startswith(
                                ("javascript:", "mailto:"))):
                        continue
                    anchor = _WS_RE.sub(
                        " ", _TAG_RE.sub("", m.group(3))).strip()
                    out.append((src, urljoin(str(src), href), anchor))
            yield pd.DataFrame(out, columns=["src", "dst", "anchor"])

    return pages.select(url_col, html_col).mapInPandas(
        gen, schema="src string, dst string, anchor string")


def pagerank(edges: DataFrame, iters: int = 10, damping: float = 0.85,
             src: str = "src", dst: str = "dst") -> DataFrame:
    """PageRank over a directed edge list -> ``(node, rank)``.

    Synchronous power iteration with the textbook semantics: uniform init
    ``1/N``; each round ``r' = (1-d)/N + d*(sum_in r/outdeg +
    dangling_mass/N)``; duplicate edges collapse first (an href repeated
    on a page is one edge).

    Scale shape: per round exactly one shuffle join of the (static,
    cached) edge list with the rank vector plus one grouped sum — both
    keyed on node id, so AQE handles hub skew; the dangling mass is a
    single driver scalar per round (a reduce, same as GraphX/Pregel); the
    plan is truncated every round with ``localCheckpoint``. |V|-sized
    state only, never |V|^2; at 10^12 pages the rank vector is a plain
    keyed DataFrame like any other stage table.
    """
    from . import _cache

    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    _cache.begin("pagerank")
    e = _cache.hold("pagerank", e)
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))).distinct()
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    base = nodes.join(deg, nodes["node"] == deg["src"], "left").select(
        "node", F.coalesce("outdeg", F.lit(0)).alias("outdeg"))
    base = _cache.hold("pagerank", base)
    n = base.count()
    if n == 0:
        return base.select("node", F.lit(0.0).alias("rank"))

    ranks = base.select(
        "node", "outdeg", F.lit(1.0 / n).alias("rank")
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        dangling = (
            ranks.filter(F.col("outdeg") == 0)
            .agg(F.sum("rank")).first()[0] or 0.0
        )
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .select(e["dst"], (F.col("rank") / F.col("outdeg")).alias("w"))
            .groupBy("dst").agg(F.sum("w").alias("inflow"))
        )
        ranks = base.join(
            contrib, base["node"] == contrib["dst"], "left"
        ).select(
            "node", "outdeg",
            (F.lit((1.0 - damping) / n)
             + F.lit(damping)
             * (F.coalesce(F.col("inflow"), F.lit(0.0))
                + F.lit(dangling / n))).alias("rank"),
        ).localCheckpoint(eager=True)
    return ranks.select("node", "rank")


def anchor_text_field(pages: DataFrame, url_col: str = "url",
                      html_col: str = "html",
                      max_anchors: int = 64) -> DataFrame:
    """Incoming-anchor-text column per page — the classic web ranking
    signal (anchors describe the TARGET document, so search engines index
    a page under the words other pages use to link to it).

    Pipeline: :func:`extract_links` -> drop empty/self anchors -> cap at
    ``max_anchors`` distinct anchors per target (mega-inlink pages like
    homepages would otherwise accumulate unbounded text — the cap bounds
    both the groupBy state and the doc length) -> space-join. Returns
    ``(url, anchor_text)`` for pages that HAVE incoming anchors; callers
    left-join it onto the page table and concat into the searchable text,
    e.g.::

        anchors = anchor_text_field(pages)
        enriched = pages.join(anchors, "url", "left").withColumn(
            "text", F.concat_ws(" ", "text", "anchor_text"))

    Scale shape: one shuffle keyed on target url. The ``(dst, anchor)``
    distinct runs first with map-side partial aggregation, so repeated
    anchors (nav chrome pointing at the same hub) collapse before the
    wire; the cap then bounds the joined text. A true mega-hub still
    accumulates up to its distinct-anchor set in the aggregation state —
    if that becomes the skew key, salt the distinct by a hash of the
    anchor and re-merge, the same two-level trick the facet battery uses.
    """
    links = extract_links(pages, url_col=url_col, html_col=html_col)
    cleaned = (
        links.filter((F.col("anchor") != "") & (F.col("src") != F.col("dst")))
        .select(F.col("dst").alias(url_col), "anchor")
        .distinct()
    )
    return cleaned.groupBy(url_col).agg(
        F.array_join(
            F.slice(F.array_sort(F.collect_set("anchor")), 1, max_anchors),
            " ",
        ).alias("anchor_text")
    )
