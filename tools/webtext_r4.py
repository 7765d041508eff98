"""Scale-confidence run of the ROUND-4 webtext operators at 3.2M docs
(same cached corpus and protocol as tools/webtext_sf1.py): one wall
measurement per operator at local[32], printed as a JSON line and a
markdown table for BENCH.md.

Operators: model-based quality classifier (NB hashed buckets),
corpus-wide duplicated-line removal, per-language corpus data card, and
the end-to-end fuzzy-dedup stage (on a 320k slice — the LSH verify step
is quadratic in bucket occupancy on a corpus whose pages are near-dups
by construction, so the slice keeps the demo honest while the building
blocks' own 3.2M rows already sit in BENCH.md).

Usage: python tools/webtext_r4.py [corpus_dir] [cpus]
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

    spark = get_spark(app_name="webtext_r4", master=f"local[{cpus}]",
                      shuffle_partitions=4 * cpus)
    pages = spark.read.parquet(corpus).select(
        "url", "text", "lang",
        F.xxhash64("url").alias("doc_id"),
    )
    n_docs = pages.count()

    from marc_solr_profiling_spark.functions.quality_classifier import (
        nb_quality_score,
    )
    from marc_solr_profiling_spark.functions.textstats import corpus_datacard
    from marc_solr_profiling_spark.functions.webclean import (
        remove_duplicate_lines,
    )
    from marc_solr_profiling_spark.operators.dedup import fuzzy_dedup_keep

    h = F.col("doc_id")
    pos_seed = pages.filter(F.pmod(h, F.lit(1000)) == 0)   # ~3.2k docs
    neg_seed = pages.filter(F.pmod(h, F.lit(1000)) == 1)   # ~3.2k docs
    slice_320k = pages.filter(F.pmod(h, F.lit(10)) == 0)

    OPS = {
        "quality_classifier_3k_seeds": lambda: nb_quality_score(
            pages, pos_seed, neg_seed).agg(
                F.sum(F.col("keep").cast("long"))).first(),
        "line_dedup_clean": lambda: remove_duplicate_lines(pages)
        .agg(F.sum("n_kept")).first(),
        "corpus_datacard": lambda: corpus_datacard(pages).count(),
        "fuzzy_dedup_keep_320k": lambda: fuzzy_dedup_keep(
            slice_320k).agg(F.sum(F.col("kept").cast("long"))).first(),
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
        n = n_docs / 10 if name.endswith("320k") else n_docs
        rate = round(n / w / 1e6 * 60, 1) if w else float("inf")
        print(f"| {name} | {w} | {rate} |")


if __name__ == "__main__":
    main()
