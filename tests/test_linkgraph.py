"""Link-graph operators: anchor extraction semantics and PageRank against
an independent numpy power-iteration reference (dangling + damping)."""
from __future__ import annotations

import numpy as np
import pytest

from marc_solr_profiling_spark.operators.linkgraph import (
    extract_links,
    pagerank,
)

HTML = b"""<html><body>
<a href="https://other.example/a">Plain <b>bold</b> anchor</a>
<a href='/relative/path'>rel</a>
<a href="page2">sibling</a>
<a href="#frag">skip-frag</a>
<a href="javascript:void(0)">skip-js</a>
<a href="mailto:x@y.z">skip-mail</a>
<a name="no-href">not a link</a>
<a href="https://dup.example/">dup</a>
<a href="https://dup.example/">dup</a>
</body></html>"""


def test_extract_links(spark):
    pages = spark.createDataFrame(
        [("https://site.example/dir/page1", bytearray(HTML))],
        "url string, html binary")
    rows = extract_links(pages).collect()
    got = {(r.dst, r.anchor) for r in rows}
    assert got == {
        ("https://other.example/a", "Plain bold anchor"),
        ("https://site.example/relative/path", "rel"),
        ("https://site.example/dir/page2", "sibling"),
        ("https://dup.example/", "dup"),
    }
    assert len(rows) == 5  # duplicate hrefs kept here (pagerank dedups)
    assert all(r.src == "https://site.example/dir/page1" for r in rows)


def _ref_pagerank(edges, iters, d=0.85):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    ix = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    e = sorted({(ix[a], ix[b]) for a, b in edges})
    outdeg = np.zeros(n)
    for a, _ in e:
        outdeg[a] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[outdeg == 0].sum()
        nxt = np.full(n, (1 - d) / n) + d * dangling / n
        for a, b in e:
            nxt[b] += d * r[a] / outdeg[a]
        r = nxt
    return {v: r[ix[v]] for v in nodes}


@pytest.mark.parametrize("iters", [1, 5])
def test_pagerank_matches_reference(spark, iters):
    # graph with a hub, a cycle, a dangling node (4 has no out-edges) and
    # a duplicate edge that must collapse
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (3, 4), (1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, iters=iters).collect()}
    ref = _ref_pagerank(edges, iters)
    assert set(got) == set(ref)
    for v in ref:
        assert got[v] == pytest.approx(ref[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_empty(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert pagerank(df, iters=2).count() == 0


def test_anchor_text_field_and_search_composition(spark, tmp_path):
    """Anchor text makes the TARGET findable: page A links to page B with
    anchor 'zzanchorterm'; after enrichment, an index built over
    text+anchor_text returns B for that query even though B's own text
    never contains it."""
    from pyspark.sql import functions as F

    from marc_solr_profiling_spark.operators.linkgraph import (
        anchor_text_field,
    )
    from marc_solr_profiling_spark.operators.wand import wand_topk
    from marc_solr_profiling_spark.plans.build import build_index

    def page(url, body_text, links=()):
        body = body_text + "".join(
            f'<a href="{h}">{a}</a>' for h, a in links)
        return (url, bytearray(f"<html><body>{body}</body></html>"
                               .encode()), body_text)

    rows = [
        page("https://s.example/a", "alpha body words here",
             links=[("https://s.example/b", "zzanchorterm describes b"),
                    ("https://s.example/a", "self ignored")]),
        page("https://s.example/b", "beta body words here"),
        page("https://s.example/c", "gamma body words here",
             links=[("https://s.example/b", "zzanchorterm describes b")]),
    ]
    pages = spark.createDataFrame(
        rows, "url string, html binary, text string")

    anchors = {r.url: r.anchor_text
               for r in anchor_text_field(pages).collect()}
    # duplicate anchor from a and c collapses; self-link dropped
    assert anchors == {"https://s.example/b": "zzanchorterm describes b"}

    enriched = pages.join(
        anchor_text_field(pages), "url", "left"
    ).withColumn("text", F.concat_ws(" ", "text", "anchor_text"))
    idx = build_index(spark, enriched, str(tmp_path / "idx"),
                      n_salts=2, block_size=32)
    hits = wand_topk(idx, "zzanchorterm", k=5).collect()
    assert [h.url for h in hits] == ["https://s.example/b"]
