"""Per-stage wall-time decomposition of one scaling-job build rep.

Replicates exactly what tools/scaling_job.py measures per build rep
(fused html->tokenize tf, docs, stats, segments, dictionary commits over
the constant-layout corpus) but times every stage, so the fixed-vs-
scalable split that caps N->4N efficiency is attributable to a stage
rather than fitted from level totals.

Usage: taskset -c LO-HI python tools/prof_build.py <cpus> <corpus_dir> [reps]
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
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from pyspark.sql import functions as F

    from marc_solr_profiling_spark.operators.postings import tokenize_and_count
    from marc_solr_profiling_spark.operators.segments import build_segments
    from marc_solr_profiling_spark.plans.lineage import IndexStore
    from marc_solr_profiling_spark.session import get_spark

    spark = get_spark(
        app_name=f"prof_build_{cpus}",
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

    tmp_root = "/dev/shm" if os.path.isdir("/dev/shm") else None

    for rep in range(reps):
        idx_dir = tempfile.mkdtemp(prefix=f"prof_idx_{cpus}_", dir=tmp_root)
        store = IndexStore(idx_dir)
        marks = [("start", time.time())]

        with_ids = docs
        tf = tokenize_and_count(
            with_ids, key_col="doc_id", text_col="text", chain="text",
            html_col="html",
        )
        store.commit_stage("tf", tf)
        marks.append(("tf", time.time()))

        tf = store.read_stage(spark, "tf")
        doc_lens = tf.select("doc_id", "doc_len").dropDuplicates(["doc_id"])
        doc_tbl = doc_lens.join(with_ids.select("doc_id", "url"), "doc_id")
        store.commit_stage("docs", doc_tbl, partition_sort=["doc_id"])
        marks.append(("docs", time.time()))

        ds = store.read_stage(spark, "docs")
        store.commit_stage(
            "stats",
            ds.agg(
                F.count("*").alias("n_docs"),
                F.avg("doc_len").alias("avgdl"),
                F.sum("doc_len").alias("total_tokens"),
            ),
        )
        marks.append(("stats", time.time()))

        avgdl = float(store.read_stage(spark, "stats").collect()[0]["avgdl"])
        segs = build_segments(
            tf.select("term", "doc_id", "tf", "doc_len"),
            avgdl=avgdl, n_salts=64, block_size=128,
        )
        store.commit_stage("segments", segs)
        marks.append(("segments", time.time()))

        segs_tbl = store.read_stage(spark, "segments")
        store.commit_stage(
            "dictionary",
            segs_tbl.groupBy("term").agg(
                F.sum("n_postings").alias("df"), F.sum("tf_sum").alias("cf")
            ),
            partition_sort=["term"],
        )
        marks.append(("dictionary", time.time()))

        out = {"cpus": cpus, "rep": rep}
        for (name, t), (_, t_prev) in zip(marks[1:], marks[:-1]):
            out[name] = round(t - t_prev, 2)
        out["total"] = round(marks[-1][1] - marks[0][1], 2)
        print(out, flush=True)
        shutil.rmtree(idx_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
