"""One scaling-measurement job: generate a deterministic corpus, build the
physical index (full analyzer chain — the CPU-bound production path), run a
batch of BM25 queries. Prints one JSON line with timings.

Run by tools/scaling_bench.py at two parallelism levels on IDENTICAL input
(the corpus generator is partition-count-independent) — the sandbox
substitution for the north rule's N vs 4N executor criterion.

Usage: python tools/scaling_job.py <cpus> <n_docs> [n_queries]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1])
    n_docs = int(sys.argv[2])
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    from marc_solr_profiling_spark.corpus import generate_query_set, generate_web_pages
    from marc_solr_profiling_spark.operators.wand import wand_topk_batch
    from marc_solr_profiling_spark.plans.build import build_index
    from marc_solr_profiling_spark.session import get_spark

    spark = get_spark(
        app_name=f"scaling_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    # materialize the corpus to parquet first so build timing measures the
    # INDEX pipeline, not the generator; fixed partition count so both
    # parallelism levels read identical input files
    corpus_dir = tempfile.mkdtemp(prefix=f"scale_corpus_{cpus}_")
    idx_dir = tempfile.mkdtemp(prefix=f"scale_idx_{cpus}_")
    try:
        generate_web_pages(spark, n_docs, seed=42, partitions=64).write.mode(
            "overwrite"
        ).parquet(corpus_dir)
        docs = spark.read.parquet(corpus_dir)

        t0 = time.time()
        idx = build_index(
            spark, docs, idx_dir, key_col="url", chain="text",
            n_salts=16, block_size=128, partitions=cpus,
        )
        build_sec = time.time() - t0

        queries = generate_query_set(n_queries, seed=42)
        t0 = time.time()
        wand_topk_batch(idx, queries, k=10).count()
        query_sec = time.time() - t0

        print(
            json.dumps(
                {
                    "cpus": cpus,
                    "n_docs": n_docs,
                    "n_queries": n_queries,
                    "build_sec": round(build_sec, 3),
                    "query_sec": round(query_sec, 3),
                    "build_docs_per_sec": round(n_docs / build_sec, 1),
                    "queries_per_sec": round(n_queries / query_sec, 2),
                }
            )
        )
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)
        shutil.rmtree(idx_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
