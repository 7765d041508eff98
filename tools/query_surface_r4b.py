"""Round-4b query-surface confidence run at sf1 scale (~3.2M docs).

What it evidences (BENCH.md "round-4b query surface" row):

* MUST_NOT through the physical index (`wand_topk(exclude_query=...)`)
  at 3.2M docs — the kernel-exclusion design's cost model says an
  exclusion adds ~the excluded term's postings decode to the query.
  Measured: warm baseline vs excluding a HIGH-df term (worst case: the
  biggest possible exclusion postings + most candidates masked) and a
  mid-df term.
* The fuzzy-term expansion's scale claim — the levenshtein scan is
  TERM-level (Heaps' law), not corpus-level. Measured: the full
  dictionary expansion scan (length band + prefix gate + levenshtein)
  against the built index's term dictionary, with the vocab size.

Reuses the sf1 corpus/layout constants of tools/sf1_run.py (64 salts,
shuffle width 64, block 128, `text` chain) so walls are comparable to
the BENCH.md sf1 rows.

Usage: python tools/query_surface_r4b.py [n_docs] [cpus]
One JSON line to stdout; progress to stderr.
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

SHUFFLE_WIDTH = 64


def log(msg: str) -> None:
    print(f"# {msg}", file=sys.stderr, flush=True)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 3_200_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    tmp_root = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    corpus_dir = os.path.join(tmp_root, f"sf1_corpus_{n_docs}")
    idx_dir = os.path.join(tmp_root, f"r4b_idx_{n_docs}")
    shutil.rmtree(idx_dir, ignore_errors=True)

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

    from marc_solr_profiling_spark.corpus import _vocab
    from marc_solr_profiling_spark.operators.wand import wand_topk
    from marc_solr_profiling_spark.plans.build import build_index
    from marc_solr_profiling_spark.session import get_spark

    spark = get_spark(
        app_name=f"r4b_surface_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=SHUFFLE_WIDTH,
    )
    spark.conf.set("spark.marc.saltPartitions", str(SHUFFLE_WIDTH))
    total_bytes = sum(
        os.path.getsize(os.path.join(corpus_dir, f))
        for f in os.listdir(corpus_dir) if f.endswith(".parquet")
    )
    split_bytes = max(1 << 22, -(-total_bytes // (cpus * 4)))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split_bytes))
    spark.conf.set("spark.sql.files.openCostInBytes", "0")

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
    log(f"build {build_wall:.1f}s ({n_docs / build_wall:.0f} docs/s)")

    # term df profile: pick a high-df and a mid-df exclusion term
    v = _vocab(10000)
    query = f"{v[30]} {v[40]} {v[50]}"
    ddf = idx.cached_dictionary()
    vocab_size = ddf.count()
    hi_term = ddf.orderBy(F.desc("df"), F.asc("term")).first()
    mid_term = (
        ddf.filter(F.col("df").between(n_docs // 100, n_docs // 10))
        .orderBy(F.desc("df"), F.asc("term")).first()
    )
    log(f"vocab={vocab_size} hi_df={hi_term} mid_df={mid_term}")

    def rep3(fn) -> list:
        fn()  # warm
        out = []
        for _ in range(3):
            t = time.time()
            fn()
            out.append(round(time.time() - t, 2))
        return out

    base = rep3(lambda: wand_topk(
        idx, query, k=10, with_url=False).count())
    ex_hi = rep3(lambda: wand_topk(
        idx, query, k=10, with_url=False,
        exclude_query=hi_term["term"]).count())
    ex_mid = rep3(lambda: wand_topk(
        idx, query, k=10, with_url=False,
        exclude_query=mid_term["term"]).count())
    log(f"baseline={base} exclude_hi={ex_hi} exclude_mid={ex_mid}")

    # fuzzy expansion: pure term-dictionary scan (the operator's scale
    # claim) — same predicates as bm25_fuzzy_topk_plan
    q = v[100]
    qlen = len(q)
    t0 = time.time()
    n_expanded = (
        ddf.filter(F.length("term").between(qlen - 2, qlen + 2))
        .filter(F.substring("term", 1, 1) == q[0])
        .filter(F.levenshtein(F.col("term"), F.lit(q)) <= 2)
        .count()
    )
    fuzzy_wall = round(time.time() - t0, 2)
    log(f"fuzzy expansion of {q!r}: {n_expanded} terms in {fuzzy_wall}s")

    shutil.rmtree(idx_dir, ignore_errors=True)
    print(json.dumps({
        "n_docs": n_docs, "cpus": cpus,
        "build_wall_sec": round(build_wall, 1),
        "vocab_size": vocab_size,
        "query": query,
        "wand_base_sec": base,
        "wand_exclude_hi_sec": ex_hi,
        "exclude_hi": {"term": hi_term["term"], "df": int(hi_term["df"])},
        "wand_exclude_mid_sec": ex_mid,
        "exclude_mid": {"term": mid_term["term"], "df": int(mid_term["df"])},
        "fuzzy_scan_sec": fuzzy_wall,
        "fuzzy_expanded_terms": int(n_expanded),
    }))


if __name__ == "__main__":
    main()
