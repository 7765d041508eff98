"""A/B the tf-write/segments overlap (build_index(overlap_tf_write=)).

Interleaved ABAB... reps of the exact scaling_job build at one
parallelism level, fresh /dev/shm index dir per rep. Interleaving means
both arms sample the same slow host-noise process (BENCH.md); report
per-arm rep walls and medians.

Usage: taskset -c LO-HI python tools/ab_overlap.py <cpus> <corpus_dir> [pairs]
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHUFFLE_WIDTH = 32


def main() -> None:
    cpus = int(sys.argv[1])
    corpus_dir = sys.argv[2]
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pyspark.sql import functions as F

    from marc_solr_profiling_spark.plans.build import build_index
    from marc_solr_profiling_spark.session import get_spark

    spark = get_spark(
        app_name=f"ab_overlap_{cpus}",
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

    def one(overlap: bool) -> float:
        idx_dir = tempfile.mkdtemp(prefix="ab_idx_", dir=tmp_root)
        shutil.rmtree(idx_dir)
        t0 = time.perf_counter()
        build_index(
            spark, docs, idx_dir, key_col="url", id_col="doc_id",
            chain="text", n_salts=64, block_size=128, html_col="html",
            overlap_tf_write=overlap,
        )
        wall = time.perf_counter() - t0
        shutil.rmtree(idx_dir, ignore_errors=True)
        return wall

    one(True)  # warmup (JVM/codegen/worker pool), discarded
    walls: dict[bool, list[float]] = {True: [], False: []}
    for i in range(pairs):
        for arm in (True, False) if i % 2 == 0 else (False, True):
            w = one(arm)
            walls[arm].append(w)
            print(f"rep overlap={arm}: {w:.1f}s", flush=True)
    for arm in (False, True):
        v = walls[arm]
        print(f"overlap={arm}: median {statistics.median(v):.1f}s "
              f"reps {[round(x, 1) for x in v]}")


if __name__ == "__main__":
    main()
