"""Measure the generational-append claim: applying a small delta via
append_delta (new generation, O(|delta|)) vs incremental_update (full
re-segment of the merged corpus, O(|corpus|)).

Usage: python tools/gen_append_bench.py [n_docs] [delta_pct] [cpus]

Builds a base index on a pre-generated corpus, then applies the SAME
delta (delta_pct% new docs + 0.1% upserts + 0.1% deletes) both ways and
reports wall seconds for each, plus a query-identity check (top-10 BM25
on the flagship terms must match between the two resulting indexes).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 320_000
    delta_pct = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from pyspark.sql import functions as F

    from marc_solr_profiling_spark.corpus import generate_web_pages
    from marc_solr_profiling_spark.operators.wand import wand_topk
    from marc_solr_profiling_spark.plans.build import (
        build_index, incremental_update,
    )
    from marc_solr_profiling_spark.plans.generations import append_delta
    from marc_solr_profiling_spark.session import get_spark

    spark = get_spark(
        app_name="gen_append_bench", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    root = "/dev/shm/gen_append_bench"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)

    corpus_path = f"/dev/shm/gab_corpus_{n_docs}"
    if not os.path.isdir(corpus_path):
        generate_web_pages(spark, n_docs, seed=42, partitions=cpus * 4)\
            .write.mode("overwrite").parquet(corpus_path)
    docs = spark.read.parquet(corpus_path).select("url", "text")

    n_delta = int(n_docs * delta_pct / 100)
    # base = everything except the delta slice; deterministic split on url
    h = F.pmod(F.xxhash64("url"), F.lit(10_000))
    cut = int(10_000 * delta_pct / 100)
    base = docs.filter(h >= cut)
    new = docs.filter(h < cut)
    mods = base.filter(F.pmod(F.xxhash64("url", F.lit(1)), F.lit(1000)) == 0)\
        .withColumn("text", F.concat(F.lit("updated content "),
                                     F.col("text")))
    dels = base.filter(
        F.pmod(F.xxhash64("url", F.lit(2)), F.lit(1000)) == 0).select("url")
    delta = new.unionByName(mods)

    t0 = time.time()
    base_idx = build_index(
        spark, base, f"{root}/base", key_col="url", chain="simple",
        n_salts=16, block_size=128,
    )
    t_base = time.time() - t0
    print(f"base build: {base_idx.n_docs} docs in {t_base:.1f}s "
          f"({base_idx.n_docs / t_base:.0f} docs/s)", flush=True)

    t0 = time.time()
    gen_idx = append_delta(
        spark, base_idx, f"{root}/gen", delta_docs=delta,
        delete_keys=dels, key_col="url",
    )
    t_append = time.time() - t0

    # old path: needs delta keyed by the base's internal doc ids — map urls
    # through the docs table (upserts replace same-id; deletes by id)
    url_ids = base_idx.docs.select("doc_id", "url")
    delta_ids = delta.join(url_ids, "url", "left")
    next_id = base_idx.n_docs + 1_000_000
    delta_ids = delta_ids.withColumn(
        "doc_id",
        F.coalesce(
            "doc_id",
            F.pmod(F.xxhash64("url"), F.lit(2**40)) + F.lit(next_id)),
    )
    del_ids = dels.join(url_ids, "url").select("doc_id")
    t0 = time.time()
    merged_idx = incremental_update(
        spark, base_idx, f"{root}/merged", delta_docs=delta_ids,
        deleted_ids=del_ids, id_col="doc_id",
        n_salts=16, block_size=128,
    )
    t_full = time.time() - t0

    print(f"delta = {n_delta} new + {mods.count()} upserts + "
          f"{dels.count()} deletes", flush=True)
    print(f"append_delta (new generation):   {t_append:.1f}s", flush=True)
    print(f"incremental_update (full merge): {t_full:.1f}s", flush=True)
    print(f"speedup: {t_full / t_append:.1f}x", flush=True)

    q = "spark merge window stream"
    a = [(r["url"], round(r["score"], 6))
         for r in wand_topk(gen_idx, q, k=10, with_url=True).collect()]
    b = [(r["url"], round(r["score"], 6))
         for r in wand_topk(merged_idx, q, k=10, with_url=True).collect()]
    same = [s for _, s in a] == [s for _, s in b] and set(a) == set(b)
    print(f"top-10 identity across both paths: {same}", flush=True)
    assert same, (a, b)


if __name__ == "__main__":
    main()
