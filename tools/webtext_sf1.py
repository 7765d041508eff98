"""Scale-confidence run of the round-3 webtext/pipeline operators at
3.2M documents (the cached sf1 corpus): one wall measurement per operator
at local[32], printed as a JSON line and a markdown table for BENCH.md.

The small-SF oracle rows prove CORRECTNESS; this run is the 10x point for
the NEW operator families (hygiene, sampling, LM, graph) — the analog of
the sf1 build/query confidence run already in BENCH.md.

Usage: python tools/webtext_sf1.py [corpus_dir] [cpus]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/sf1_corpus_3200000"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from marc_solr_profiling_spark.session import get_spark

    spark = get_spark(app_name="webtext_sf1", master=f"local[{cpus}]",
                      shuffle_partitions=4 * cpus)
    pages = spark.read.parquet(corpus).select(
        "url", "text", "lang",
        F.xxhash64("url").alias("doc_id"),  # numeric key for keyed ops
    )
    n_docs = pages.count()  # also warms the file index

    from marc_solr_profiling_spark.functions.lm import ccnet_perplexity
    from marc_solr_profiling_spark.functions.webclean import (
        c4_line_filter, cleaning_funnel, duplicate_line_stats, redact_pii,
        url_dedup,
    )
    from marc_solr_profiling_spark.functions.textstats import (
        gopher_filter_stats,
    )
    from marc_solr_profiling_spark.operators.dedup import (
        benchmark_decontaminate, exact_dup_groups, minhash_signatures,
    )
    from marc_solr_profiling_spark.operators.linkgraph import pagerank
    from marc_solr_profiling_spark.operators.sampling import (
        hash_split, pack_shards,
    )

    M = 3_200_000
    h = F.col("doc_id")
    node = F.pmod(h, F.lit(M))  # bounded first: xxhash64*7 overflows ANSI
    edges = pages.select(
        node.alias("src"),
        F.pmod(node * 7 + 1, F.lit(M)).alias("dst"),
    )
    ref_lm = pages.filter(F.pmod(h, F.lit(1000)) == 0)      # ~3.2k docs
    bench = pages.filter(F.pmod(h, F.lit(1000)) == 1)       # ~3.2k docs

    OPS = {
        "url_dedup": lambda: url_dedup(pages, key_col="doc_id").count(),
        "exact_dedup": lambda: exact_dup_groups(
            pages, key_col="doc_id").count(),
        "hash_split": lambda: hash_split(pages)
        .groupBy("split").count().count(),
        "pii_redact": lambda: redact_pii(pages)
        .agg(F.sum("n_email")).first(),
        "c4_line_filter": lambda: c4_line_filter(pages)
        .agg(F.sum(F.col("kept").cast("long"))).first(),
        "gopher_filter": lambda: gopher_filter_stats(
            pages, stopwords=["the", "a"]).count(),
        "line_dedup": lambda: duplicate_line_stats(pages)
        .agg(F.sum("n_dup")).first(),
        "pack_shards": lambda: pack_shards(
            pages.select("doc_id", F.length("text").alias("n_tokens")),
            tokens_per_shard=2**20).agg(F.max("shard_id")).first(),
        "decontaminate_3k_bench": lambda: benchmark_decontaminate(
            pages, bench, n=8).agg(
                F.sum(F.col("contaminated").cast("long"))).first(),
        "lm_perplexity_3k_ref": lambda: ccnet_perplexity(
            pages, ref_lm).agg(F.avg("ppl")).first(),
        "minhash_sig16": lambda: minhash_signatures(
            pages, key_col="doc_id", n_hashes=16, shingle_n=3).count(),
        "pagerank_3it_6.4Medges": lambda: pagerank(edges, iters=3)
        .agg(F.sum("rank")).first(),
        "clean_funnel": lambda: cleaning_funnel(
            pages, stopwords=["the", "a"]).count(),
    }

    walls = {}
    for name, fn in OPS.items():
        t0 = time.time()
        fn()
        walls[name] = round(time.time() - t0, 1)
        print(f"# {name}: {walls[name]}s", file=sys.stderr)

    print(json.dumps({"n_docs": n_docs, "cpus": cpus, "walls_sec": walls}))
    print("\n| operator | wall (s) | Mdocs/min |")
    print("|---|---|---|")
    for name, w in walls.items():
        rate = round(n_docs / w / 1e6 * 60, 1) if w else float("inf")
        print(f"| {name} | {w} | {rate} |")


if __name__ == "__main__":
    main()
