"""Intra-kernel decomposition of the tf (tokenize+pack) stage — the build's
dominant stage (60% of the sf1 wall; BENCH.md). Runs the kernel's three
Python phases STANDALONE on real corpus rows read via pyarrow (no Spark,
no Arrow-IPC, no parquet write), so the measured split is attributable to
Python work alone; the difference between this total and the per-task
wall observed in a real build is the JVM side (Arrow transfer + parquet
encode + scheduling).

Usage: python tools/prof_tf_kernel.py <corpus_dir> [n_docs] [--cprofile]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    corpus_dir = sys.argv[1]
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 16_000
    do_cprofile = "--cprofile" in sys.argv

    import pyarrow.dataset as ds

    from marc_solr_profiling_spark.functions.analyzer import ANALYZERS
    from marc_solr_profiling_spark.operators.postings import _pack_token_lists
    from marc_solr_profiling_spark.sources.html import extract_text_from_html

    d = ds.dataset(corpus_dir, format="parquet")
    tbl = d.head(n_docs, columns=["url", "html"])
    htmls = tbl["html"].to_pylist()
    keys = list(range(len(htmls)))
    analyze = ANALYZERS["text"]
    print(f"# {len(htmls)} docs loaded", file=sys.stderr)

    t0 = time.perf_counter()
    texts = [extract_text_from_html(h) for h in htmls]
    t_extract = time.perf_counter() - t0

    # warm the memo on a prefix so the report separates cold/warm analysis
    for t in texts[:2000]:
        analyze(t)
    t0 = time.perf_counter()
    token_lists = [analyze(t) for t in texts]
    t_analyze = time.perf_counter() - t0

    t0 = time.perf_counter()
    lens, out_terms, out_tfs = _pack_token_lists(token_lists, keys)
    t_pack = time.perf_counter() - t0

    n_tok = int(lens.sum())
    tot = t_extract + t_analyze + t_pack
    print(f"docs={len(htmls)} tokens={n_tok}")
    for name, v in [("extract", t_extract), ("analyze", t_analyze),
                    ("pack", t_pack)]:
        print(f"{name:8s} {v:7.2f}s  {v / len(htmls) * 1e3:6.3f} ms/doc"
              f"  {v / tot * 100:5.1f}%")
    print(f"total    {tot:7.2f}s  -> {len(htmls) / tot:.0f} docs/s/core")

    if do_cprofile:
        import cProfile
        import pstats

        pr = cProfile.Profile()
        pr.enable()
        for t in texts:
            analyze(t)
        pr.disable()
        pstats.Stats(pr).sort_stats("cumulative").print_stats(15)


if __name__ == "__main__":
    main()

# appended: batch-path comparison (python tools/prof_tf_kernel.py ... --batch)
