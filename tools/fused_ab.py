"""Interleaved A/B at the 3.2M-doc cached corpus: the fused tokenize-once
webtext pass vs the four standalone operators it replaces
(gopher flags+stats, fast64 minhash-16, benchmark decontamination, CCNet
LM) — the round-3 'tokenize once' lever, measured.

Protocol: same JVM, alternating sweeps (parts sweep, fused, parts sweep,
fused, ...), medians reported — the equal-window discipline from
BENCH.md (host IPC noise makes only interleaved runs comparable).

Usage: python tools/fused_ab.py [corpus_dir] [cpus] [rounds]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/sf1_corpus_3200000"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from marc_solr_profiling_spark.session import get_spark

    spark = get_spark(app_name="fused_ab", master=f"local[{cpus}]",
                      shuffle_partitions=4 * cpus)
    pages = spark.read.parquet(corpus).select(
        "url", "text", F.xxhash64("url").alias("doc_id"))
    n_docs = pages.count()

    from marc_solr_profiling_spark.functions.lm import ccnet_perplexity
    from marc_solr_profiling_spark.functions.textstats import (
        gopher_filter_stats,
    )
    from marc_solr_profiling_spark.functions.webtext_pass import (
        webtext_signals,
    )
    from marc_solr_profiling_spark.operators.dedup import (
        benchmark_decontaminate, minhash_signatures,
    )

    h = F.col("doc_id")
    ref_lm = pages.filter(F.pmod(h, F.lit(1000)) == 0)
    bench = pages.filter(F.pmod(h, F.lit(1000)) == 1)
    sw = ["the", "a"]

    PARTS = {
        "gopher_filter": lambda: gopher_filter_stats(
            pages, stopwords=sw).count(),
        "minhash_sig16": lambda: minhash_signatures(
            pages, key_col="doc_id", n_hashes=16, shingle_n=3,
            hash_impl="fast64").count(),
        "decontaminate": lambda: benchmark_decontaminate(
            pages, bench, n=8).agg(
                F.sum(F.col("contaminated").cast("long"))).first(),
        "lm_perplexity": lambda: ccnet_perplexity(
            pages, ref_lm).agg(F.avg("ppl")).first(),
    }

    def fused() -> None:
        webtext_signals(
            pages, stopwords=sw, n_hashes=16, bench_docs=bench,
            ref_docs=ref_lm,
        ).agg(
            F.sum(F.col("contaminated").cast("long")), F.avg("ppl"),
            F.count("h0"), F.sum(F.col("r_top2").cast("long")),
        ).first()

    walls: dict[str, list[float]] = {k: [] for k in PARTS}
    walls["fused_pass"] = []
    for r in range(rounds):
        for name, fn in PARTS.items():
            t0 = time.time()
            fn()
            walls[name].append(round(time.time() - t0, 1))
            print(f"# r{r} {name}: {walls[name][-1]}s", file=sys.stderr)
        t0 = time.time()
        fused()
        walls["fused_pass"].append(round(time.time() - t0, 1))
        print(f"# r{r} fused_pass: {walls['fused_pass'][-1]}s",
              file=sys.stderr)

    med = {k: statistics.median(v) for k, v in walls.items()}
    parts_sum = sum(med[k] for k in PARTS)
    print(json.dumps({
        "n_docs": n_docs, "cpus": cpus, "rounds": rounds,
        "walls_sec": walls, "medians": med,
        "parts_sum_sec": round(parts_sum, 1),
        "fused_sec": med["fused_pass"],
        "saving_pct": round(100 * (1 - med["fused_pass"] / parts_sum), 1),
    }))


if __name__ == "__main__":
    main()
