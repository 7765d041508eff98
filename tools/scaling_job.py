"""One scaling-measurement job: generate a deterministic corpus, build the
physical index through the PRODUCTION path (HTML->text extraction UDF +
full analyzer chain), run a batch of BM25 queries. Prints one JSON line
with timings.

Run by tools/scaling_bench.py at two parallelism levels on IDENTICAL input
(the corpus generator is partition-count-independent) — the sandbox
substitution for the north rule's N vs 4N executor criterion.

doc_id comes from the corpus's stable per-document key (the numeric url
suffix here; xxhash64(url) in a real Common-Crawl pipeline) — a pure
per-row expression, so id assignment adds no shuffle or driver pass.

The sandbox VM has noisy neighbors (observed 2x wall-time swings at
identical parameters, ~10% steal in top), so the job repeats the
build+query measurement ``n_reps`` times over the same corpus and reports
the MINIMUM — the least-interfered estimate of the pipeline's capability.

Usage: python tools/scaling_job.py <cpus> <n_docs> [n_queries] [n_reps]
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
    n_reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    from pyspark.sql import functions as F

    from marc_solr_profiling_spark.corpus import generate_query_set, generate_web_pages
    from marc_solr_profiling_spark.operators.wand import wand_topk_batch
    from marc_solr_profiling_spark.plans.build import build_index
    from marc_solr_profiling_spark.session import get_spark
    # shuffle width 4x cores: a straggler costs a quarter-wave, not a full
    # one (AQE coalesces any resulting tiny partitions back together)
    # CONSTANT shuffle width across levels (not 4x cores): a real N-vs-4N
    # cluster comparison holds the data layout fixed — the same job, the
    # same shuffle partitioning, more executors. Scaling the width with
    # the level hands the small level fewer/larger partitions (less
    # per-task and per-Arrow-batch overhead), biasing the ratio UP for
    # the small level and understating true scaling.
    shuffle_width = 32
    spark = get_spark(
        app_name=f"scaling_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle_width,
    )
    # corpus parquet: pre-generated shared dir (SPARK_GRAFT_CORPUS_DIR, see
    # tools/gen_corpus.py — generation happens once, unpinned, outside the
    # measured core budget) or generated here as a fallback. Fixed partition
    # count so every parallelism level reads identical input files.
    # tmpfs when available: measures the pipeline, not the sandbox's
    # virtio-disk syscall ceiling (a real cluster has per-executor SSDs)
    tmp_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    shared_corpus = os.environ.get("SPARK_GRAFT_CORPUS_DIR")
    own_corpus = shared_corpus is None or not os.path.exists(
        os.path.join(shared_corpus, "_SUCCESS")
    )
    if own_corpus:
        corpus_dir = tempfile.mkdtemp(
            prefix=f"scale_corpus_{cpus}_", dir=tmp_root
        )
    else:
        corpus_dir = shared_corpus
    idx_dir = tempfile.mkdtemp(prefix=f"scale_idx_{cpus}_", dir=tmp_root)
    try:
        if own_corpus:
            generate_web_pages(spark, n_docs, seed=42, partitions=256).write.mode(
                "overwrite"
            ).option("parquet.enable.dictionary", "false").parquet(corpus_dir)
        # CONSTANT split count across levels (same reasoning as the fixed
        # shuffle width above: identical input layout at every cluster
        # size). 32 splits = 4 waves per core at the largest level and
        # fine-grained balance at the smallest.
        total_bytes = sum(
            os.path.getsize(os.path.join(corpus_dir, f))
            for f in os.listdir(corpus_dir) if f.endswith(".parquet")
        )
        split_bytes = max(1 << 22, -(-total_bytes // shuffle_width))
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(split_bytes))
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        # production input: raw pages only; extraction fuses into the
        # tokenize kernel (html_col below) — one Python worker per task
        docs = (
            spark.read.parquet(corpus_dir)
            .select("url", "html")
            .withColumn(
                "doc_id",
                F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long"),
            )
        )

        queries = generate_query_set(n_queries, seed=42)
        build_sec = query_sec = float("inf")
        for rep in range(n_reps):
            shutil.rmtree(idx_dir, ignore_errors=True)
            t0 = time.time()
            idx = build_index(
                spark, docs, idx_dir, key_col="url", id_col="doc_id",
                chain="text", n_salts=64, block_size=128, partitions=cpus,
                html_col="html",
            )
            b = time.time() - t0
            build_sec = min(build_sec, b)
            # per-stage timing from manifest commit timestamps (diagnostic)
            stages = idx.store.lineage()["stages"]
            order = sorted(stages, key=lambda s: stages[s]["committed_at"])
            prev = t0
            marks = {}
            for s in order:
                marks[s] = round(stages[s]["committed_at"] - prev, 1)
                prev = stages[s]["committed_at"]
            print(f"# rep{rep} cpus={cpus} build={b:.1f}s stages={marks}",
                  file=sys.stderr)

            t0 = time.time()
            wand_topk_batch(idx, queries, k=10).count()
            q = time.time() - t0
            query_sec = min(query_sec, q)
            print(f"# rep{rep} cpus={cpus} query={q:.1f}s", file=sys.stderr)

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
        if own_corpus:
            shutil.rmtree(corpus_dir, ignore_errors=True)
        shutil.rmtree(idx_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
