"""Scale-confidence run of the round-4c operators at 3.2M documents
(the cached sf1 corpus): one wall measurement per operator at
local[32], printed as a JSON line and a markdown table for BENCH.md.

The small-SF oracle rows prove CORRECTNESS; this is the 10x point for
DSIR selection, incremental cross-snapshot dedup, and the
training-order shuffle — same protocol as tools/webtext_sf1.py.

Usage: python tools/r4c_sf1.py [corpus_dir] [cpus]
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

    spark = get_spark(app_name="r4c_sf1", master=f"local[{cpus}]",
                      shuffle_partitions=4 * cpus)
    pages = spark.read.parquet(corpus).select(
        "url", "text",
        F.xxhash64("url").alias("doc_id"),
    )
    n_docs = pages.count()

    from marc_solr_profiling_spark.functions.dsir import dsir_logweight
    from marc_solr_profiling_spark.operators.dedup import (
        dedup_against, minhash_band_table)
    from marc_solr_profiling_spark.operators.sampling import global_shuffle

    h = F.col("doc_id")
    target = pages.filter(F.pmod(h, F.lit(1000)) == 0)  # ~3.2k seed docs
    # incremental-dedup split: ~97% archive, ~3% "new crawl" — the
    # asymmetric shape the operator is for
    old = pages.filter(F.pmod(h, F.lit(32)) != 0)
    new = pages.filter(F.pmod(h, F.lit(32)) == 0)

    walls = {}

    def run(name, fn):
        t0 = time.time()
        fn()
        walls[name] = round(time.time() - t0, 1)
        print(f"# {name}: {walls[name]}s", file=sys.stderr)

    run("dsir_logweight_3k_target", lambda: dsir_logweight(
        pages, target).agg(F.avg("dsir_logw")).first())
    run("global_shuffle", lambda: global_shuffle(
        pages, partitions=4 * cpus).agg(F.max("shuffle_rank")).first())
    # band table of the 3.1M-doc archive (the stored index a production
    # run would already have), then the 100k-doc increment against it
    bt = minhash_band_table(old, key_col="doc_id")
    run("old_band_table_3.1M", lambda: bt.write.mode("overwrite")
        .parquet("/dev/shm/r4c_bandtable"))
    stored = spark.read.parquet("/dev/shm/r4c_bandtable")
    run("dedup_against_100k_vs_3.1M", lambda: dedup_against(
        new, old, old_bands=stored).agg(
            F.sum(F.col("kept").cast("long"))).first())

    print(json.dumps({"n_docs": n_docs, "cpus": cpus, "walls_sec": walls}))
    print("\n| operator | wall (s) |")
    print("|---|---|")
    for name, w in walls.items():
        print(f"| {name} | {w} |")


if __name__ == "__main__":
    main()
