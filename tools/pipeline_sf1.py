"""Scale-confidence run for the end-to-end training-data pipeline
(plans/pipeline.py) at 3.2M docs on local[8]: exact dedup -> Gopher gate
-> benchmark decontamination -> shard packing, reporting per-stage wall
and the data card. Reuses the cached /dev/shm corpus if present.

Usage: python tools/pipeline_sf1.py [n_docs] [cpus] [--fuzzy]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 3_200_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    fuzzy = "--fuzzy" in sys.argv

    from pyspark.sql import functions as F

    from marc_solr_profiling_spark.corpus import generate_web_pages
    from marc_solr_profiling_spark.plans.pipeline import build_training_data
    from marc_solr_profiling_spark.session import get_spark

    spark = get_spark(app_name="pipeline_sf1", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus * 4, 32))
    corpus_path = f"/dev/shm/gab_corpus_{n_docs}"
    if not os.path.isdir(corpus_path):
        generate_web_pages(spark, n_docs, seed=42, partitions=cpus * 4)\
            .write.mode("overwrite").parquet(corpus_path)
    docs = spark.read.parquet(corpus_path).select(
        F.xxhash64("url").alias("doc_id"), "text")
    bench = docs.filter(F.pmod(F.col("doc_id"), F.lit(997)) == 0)

    out = "/dev/shm/pipeline_sf1_out"
    shutil.rmtree(out, ignore_errors=True)
    fz = (dict(n_hashes=16, bands=4, shingle_n=3, max_bucket=200,
               threshold=0.2) if fuzzy else None)
    t0 = time.time()
    td = build_training_data(
        spark, docs, out, key_col="doc_id", text_col="text",
        stopwords=["the", "a"],
        gopher_thresholds=dict(
            min_tokens=30, max_tokens=2000, min_mean_word_len=2.0,
            max_mean_word_len=12.0, min_distinct_stopwords=1,
            max_punct_ratio=0.9, max_top2_frac=0.2, max_dup5_frac=0.5,
        ),
        fuzzy=fz, benchmark=bench, decontam_n=5, decontam_max_hits=0,
        tokens_per_shard=2_000_000,
    )
    wall = time.time() - t0
    for r in td.card().orderBy("stage_order").collect():
        print(f"  {r['stage']:10s} in={r['n_in']:>9} kept={r['n_kept']:>9}"
              f" dropped={r['n_dropped']:>8}")
    card = td.card().collect()[0]
    print(f"total_weight={card['total_weight']} n_shards={card['n_shards']}")
    print(f"pipeline wall: {wall:.1f}s at {n_docs} docs local[{cpus}]"
          f" fuzzy={fuzzy} ({n_docs / wall:.0f} docs/s)")


if __name__ == "__main__":
    main()
