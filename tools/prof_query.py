"""Per-step decomposition of one scaling-job query batch rep.

Builds the index once (outside measurement), then times each driver
step of wand_topk_batch across reps: query analysis, dictionary idf
lookup, matched-cache materialization + salt repartition sampler, and
the main scoring job — so the per-batch fixed overhead S that caps
N->4N query efficiency is attributable.

Usage: taskset -c LO-HI python tools/prof_query.py <cpus> <corpus_dir> [reps] [n_queries]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHUFFLE_WIDTH = int(os.environ.get("PROF_WIDTH", "32"))


def main() -> None:
    cpus = int(sys.argv[1])
    corpus_dir = sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    n_queries = int(sys.argv[4]) if len(sys.argv) > 4 else 10000

    from pyspark.sql import functions as F

    from marc_solr_profiling_spark.corpus import generate_query_set
    from marc_solr_profiling_spark.operators import _cache
    from marc_solr_profiling_spark.operators.wand import (
        _analyze_query, _by_salt, wand_topk_batch,
    )
    from marc_solr_profiling_spark.oracle import bm25_idf
    from marc_solr_profiling_spark.plans.build import build_index
    from marc_solr_profiling_spark.session import get_spark

    spark = get_spark(
        app_name=f"prof_query_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=SHUFFLE_WIDTH,
    )
    spark.conf.set("spark.marc.saltPartitions", str(SHUFFLE_WIDTH))

    total_bytes = sum(
        os.path.getsize(os.path.join(corpus_dir, f))
        for f in os.listdir(corpus_dir) if f.endswith(".parquet")
    )
    split_bytes = max(1 << 22, -(-total_bytes // SHUFFLE_WIDTH))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split_bytes))
    spark.conf.set("spark.sql.files.openCostInBytes", "0")

    docs = (
        spark.read.parquet(corpus_dir)
        .select("url", "html")
        .withColumn(
            "doc_id", F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
        )
    )
    queries = generate_query_set(n_queries, seed=42)

    tmp_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    idx_dir = tempfile.mkdtemp(prefix=f"profq_idx_{cpus}_", dir=tmp_root)
    try:
        idx = build_index(
            spark, docs, idx_dir, key_col="url", id_col="doc_id",
            chain="text", n_salts=64, block_size=128, html_col="html",
        )
        # warmup batch
        wand_topk_batch(idx, queries, k=10).count()

        for rep in range(reps):
            marks = [("start", time.time())]
            per_q = {i: _analyze_query(q, "text") for i, q in enumerate(queries)}
            all_terms = sorted({t for ts in per_q.values() for t in ts})
            marks.append(("analyze", time.time()))

            qterms_df = spark.createDataFrame(
                [(t,) for t in all_terms], "term string"
            )
            drows = idx.cached_dictionary().join(
                F.broadcast(qterms_df), "term"
            ).collect()
            idf = {r["term"]: bm25_idf(idx.n_docs, int(r["df"])) for r in drows}
            marks.append(("dict", time.time()))

            hit_df = spark.createDataFrame([(t,) for t in idf], "term string")
            _cache.begin("profq")
            matched = _cache.hold(
                "profq", idx.segments.join(F.broadcast(hit_df), "term")
            )
            matched.count()  # materialize the cache explicitly
            marks.append(("cache_fill", time.time()))

            _by_salt(matched, idx).count()  # sampler + shuffle, no scoring
            marks.append(("repart", time.time()))

            # full batch (re-uses its own cache generation)
            wand_topk_batch(idx, queries, k=10).count()
            marks.append(("full_batch", time.time()))

            out = {"cpus": cpus, "rep": rep}
            for (name, t), (_, t_prev) in zip(marks[1:], marks[:-1]):
                out[name] = round(t - t_prev, 2)
            print(out, flush=True)
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
