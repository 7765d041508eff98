"""Diagnose tf-stage scaling: run ONLY corpus-read -> extract -> fused
tokenize+count -> parquet write at one parallelism level, and report wall
time plus per-allowed-core CPU accounting (user/sys/idle/iowait/steal) so
contention vs starvation is distinguishable.

Usage: taskset -c 0-N-1 python tools/diag_tf.py <cpus> [n_docs]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cpu_sample(cores):
    out = {}
    with open("/proc/stat") as f:
        for line in f:
            if line.startswith("cpu") and line[3:4].isdigit():
                fld = line.split()
                idx = int(fld[0][3:])
                if idx in cores:
                    out[idx] = [int(x) for x in fld[1:9]]
    return out


def main() -> None:
    cpus = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 60000
    cores = sorted(os.sched_getaffinity(0))

    from pyspark.sql import functions as F

    from marc_solr_profiling_spark.corpus import generate_web_pages
    from marc_solr_profiling_spark.operators.postings import tokenize_and_count
    from marc_solr_profiling_spark.session import get_spark
    from marc_solr_profiling_spark.sources.html import extract_text_udf

    spark = get_spark(
        app_name=f"diag_tf_{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=4 * cpus,
    )
    tmp_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    corpus_dir = tempfile.mkdtemp(prefix=f"diag_corpus_{cpus}_", dir=tmp_root)
    out_dir = tempfile.mkdtemp(prefix=f"diag_tf_{cpus}_", dir=tmp_root)
    try:
        generate_web_pages(spark, n_docs, seed=42, partitions=256).write.mode(
            "overwrite"
        ).parquet(corpus_dir)
        total_bytes = sum(
            os.path.getsize(os.path.join(corpus_dir, f))
            for f in os.listdir(corpus_dir) if f.endswith(".parquet")
        )
        split_bytes = max(1 << 22, -(-total_bytes // (4 * cpus)))
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(split_bytes))
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        if os.environ.get("DIAG_DICT") == "0":
            spark.conf.set("spark.hadoop.parquet.enable.dictionary", "false")
        if os.environ.get("DIAG_BLOCK"):
            spark.conf.set(
                "spark.hadoop.parquet.block.size", os.environ["DIAG_BLOCK"]
            )
        if os.environ.get("DIAG_CODEC"):
            spark.conf.set(
                "spark.sql.parquet.compression.codec", os.environ["DIAG_CODEC"]
            )

        for rep in range(2):
            docs = (
                spark.read.parquet(corpus_dir)
                .select("url", "html")
                .withColumn("text", extract_text_udf()(F.col("html")))
                .withColumn(
                    "doc_id", F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
                )
            )
            tf = tokenize_and_count(docs, key_col="doc_id", text_col="text")
            shutil.rmtree(out_dir, ignore_errors=True)
            a = cpu_sample(set(cores))
            t0 = time.time()
            mode = os.environ.get("DIAG_MODE", "write")
            if mode == "count":
                tf.count()
            else:
                tf.write.mode("overwrite").parquet(out_dir)
            wall = time.time() - t0
            b = cpu_sample(set(cores))
            agg = [sum(b[c][i] - a[c][i] for c in cores) for i in range(8)]
            user, nice, syst, idle, iow, irq, sirq, steal = agg
            busy = (user + nice + syst) / 100.0
            print(
                f"# rep{rep} cpus={cpus} wall={wall:.1f}s cores={len(cores)} "
                f"cpu_busy={busy:.1f}s ({busy / wall / len(cores) * 100:.0f}% of "
                f"{len(cores)}x{wall:.0f}s) idle={idle/100:.1f}s "
                f"iowait={iow/100:.1f}s steal={steal/100:.1f}s",
                flush=True,
            )
            # per-process attribution: cumulative CPU of the JVM vs the
            # pyspark worker daemons (coarse — cumulative since spawn)
            import subprocess
            ps = subprocess.run(
                ["ps", "-eo", "comm,pid,time"], capture_output=True, text=True
            ).stdout
            jvm = [ln for ln in ps.splitlines() if ln.startswith("java")]
            pyw = [ln for ln in ps.splitlines() if "python" in ln]
            print(f"#   java: {jvm}", flush=True)
            print(f"#   python procs: {len(pyw)}: {pyw[:20]}", flush=True)
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
