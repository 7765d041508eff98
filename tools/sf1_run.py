"""One larger-scale confidence run: a single sf1-class build (~3.2M docs,
10x the scaling-protocol corpus) plus a query batch at local[32].

Purpose (BENCH.md "sf1 confidence run" row): every constant in the build
path — packed-posting kernel batch sizes, salt routing, the
``range_buckets="auto"`` segment-stage sizing, block size 128 — was
measured at <= 320k docs.  This driver runs the IDENTICAL job shape
(same n_salts=64 / shuffle-width-64 layout as tools/scaling_job.py, so
the per-doc cost is directly comparable to the protocol rows) at 10x
the documents and reports:

  * end-to-end build wall + docs/sec
  * per-stage wall + rows from the manifest lineage (tf / stats / docs /
    segments), so a constant that stops holding shows up as a stage, not
    a guess
  * the resolved range_buckets value and resulting segment row count
  * warm query-batch throughput (3 reps of a 20k-query batch, k=10)

Usage: python tools/sf1_run.py [n_docs] [cpus] [n_queries]
Writes one JSON line to stdout; progress to stderr.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

SHUFFLE_WIDTH = 64  # protocol constant (tools/scaling_job.py)


def log(msg: str) -> None:
    print(f"# {msg}", file=sys.stderr, flush=True)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 3_200_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000

    tmp_root = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    corpus_dir = os.path.join(tmp_root, f"sf1_corpus_{n_docs}")
    idx_dir = os.path.join(tmp_root, f"sf1_idx_{n_docs}")
    shutil.rmtree(idx_dir, ignore_errors=True)

    # corpus generation in its own JVM at full host parallelism — not part
    # of the measured build (a real pipeline reads pre-existing Iceberg)
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        log(f"generating corpus: {n_docs} docs -> {corpus_dir}")
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, os.path.join(HERE, "gen_corpus.py"),
             str(n_docs), corpus_dir],
            capture_output=True, text=True, timeout=3600, cwd=REPO,
        )
        if r.returncode != 0:
            raise RuntimeError(f"corpus gen failed:\n{r.stderr[-3000:]}")
        log(f"corpus generated in {time.time() - t0:.0f}s")

    from pyspark.sql import functions as F

    from marc_solr_profiling_spark.corpus import generate_query_set
    from marc_solr_profiling_spark.operators.wand import wand_topk_batch
    from marc_solr_profiling_spark.plans.build import build_index
    from marc_solr_profiling_spark.session import get_spark

    spark = get_spark(
        app_name=f"sf1_run_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=SHUFFLE_WIDTH,
    )
    spark.conf.set("spark.marc.saltPartitions", str(SHUFFLE_WIDTH))

    total_bytes = sum(
        os.path.getsize(os.path.join(corpus_dir, f))
        for f in os.listdir(corpus_dir) if f.endswith(".parquet")
    )
    # same layout rule as the protocol: a fixed split count, here sized so
    # the scan stage runs 4 waves at local[32]
    split_bytes = max(1 << 22, -(-total_bytes // (cpus * 4)))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split_bytes))
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    log(f"corpus bytes={total_bytes} split_bytes={split_bytes}")

    docs = (
        spark.read.parquet(corpus_dir)
        .select("url", "html")
        .withColumn(
            "doc_id",
            F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long"),
        )
    )

    t0 = time.time()
    idx = build_index(
        spark, docs, idx_dir, key_col="url", id_col="doc_id",
        chain="text", n_salts=64, block_size=128, html_col="html",
    )
    build_wall = time.time() - t0
    log(f"build done in {build_wall:.1f}s -> {n_docs / build_wall:.0f} docs/s")

    lineage = idx.store.lineage()
    stages = {
        name: {
            "rows": info.get("rows"),
            "duration_sec": info.get("duration_sec"),
            "bytes": info.get("bytes"),
            "n_partitions": len(info.get("partitions") or []),
        }
        for name, info in lineage.get("stages", {}).items()
    }

    queries = generate_query_set(n_queries, seed=42)
    # one warm rep (codegen/worker spawn), then timed reps
    wand_topk_batch(idx, queries, k=10).count()
    reps = []
    for _ in range(3):
        t0 = time.time()
        wand_topk_batch(idx, queries, k=10).count()
        reps.append(time.time() - t0)
        log(f"query rep {reps[-1]:.1f}s -> {n_queries / reps[-1]:.0f} q/s")

    # single-query latency: warm wand_topk on the same phrases used for
    # the positional comparison below — vocab-derived so they are real
    # high/mid-df terms (high-df is phrase verification's WORST case)
    from marc_solr_profiling_spark.corpus import _vocab
    from marc_solr_profiling_spark.operators.wand import wand_topk

    v = _vocab(10000)
    test_qs = [f"{v[0]} {v[1]}", f"{v[100]} {v[101]}",
               f"{v[30]} {v[40]} {v[50]}"]
    wand_topk(idx, test_qs[0], k=10, with_url=False).count()
    wand_lat = {}
    for q in test_qs:
        t0 = time.time()
        wand_topk(idx, q, k=10, with_url=False).count()
        wand_lat[q] = round(time.time() - t0, 2)
    log(f"wand single-query latencies {wand_lat}")
    shutil.rmtree(idx_dir, ignore_errors=True)

    # ---- second build WITH positions (same corpus) for the sf1-scale
    # phrase-vs-wand comparison (VERDICT r2 item 2 done-criterion) + the
    # positional-index build-overhead number
    from marc_solr_profiling_spark.operators.phrase import phrase_topk

    pos_dir = idx_dir + "_pos"
    shutil.rmtree(pos_dir, ignore_errors=True)
    t0 = time.time()
    pidx = build_index(
        spark, docs, pos_dir, key_col="url", id_col="doc_id",
        chain="text", n_salts=64, block_size=128, html_col="html",
        positions=True,
    )
    pos_build_wall = time.time() - t0
    log(f"positional build {pos_build_wall:.1f}s "
        f"-> {n_docs / pos_build_wall:.0f} docs/s")

    phrase_topk(pidx, test_qs[0], k=10).count()  # warm
    phrase_lat = {}
    for ph in test_qs:
        t0 = time.time()
        phrase_topk(pidx, ph, k=10).count()
        phrase_lat[ph] = round(time.time() - t0, 2)
    # the same queries through wand on the positional index (apples to
    # apples: identical snapshot, phrase adds the position-verify stage)
    pos_wand_lat = {}
    for q in test_qs:
        t0 = time.time()
        wand_topk(pidx, q, k=10, with_url=False).count()
        pos_wand_lat[q] = round(time.time() - t0, 2)
    log(f"phrase latencies {phrase_lat} vs wand {pos_wand_lat}")

    out = {
        "n_docs": n_docs,
        "cpus": cpus,
        "corpus_bytes": total_bytes,
        "build_wall_s": round(build_wall, 1),
        "build_docs_per_sec": round(n_docs / build_wall, 1),
        "stages": stages,
        "n_salts": idx.n_salts,
        "query_batch": n_queries,
        "query_rep_s": [round(r, 2) for r in reps],
        "queries_per_sec": round(n_queries / min(reps), 1),
        "wand_single_query_s": wand_lat,
        "pos_build_wall_s": round(pos_build_wall, 1),
        "phrase_query_s": phrase_lat,
        "pos_wand_query_s": pos_wand_lat,
    }
    print(json.dumps(out), flush=True)
    shutil.rmtree(pos_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
