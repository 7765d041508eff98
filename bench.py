"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall time of the headline query set (lower = better).
Additional context fields (throughput, scaling) are included when
SPARK_GRAFT_SCALING=1 runs the index build at two parallelism levels.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "tf_top",
    "doc_stats",
    "collection_stats",
    "postings_top",
    "bm25_topk",
    "numfound",
    "terms_browse",
    "facet_lang",
    "dedup_exact",
    "text_profile",
    "minhash_sig",
    "simhash",
    "knn_cosine",
    "merge_upsert",
    "term_vectors",
    "lang_id",
    "ngram_jaccard",
    "facet_event_type",
    "bm25_and_topk",
    "bm25_stopword_topk",
    "bm25_synonym_topk",
    "bm25_and_phys_topk",
    "bm25_phrase_topk",
    "bm25_phrase_phys_topk",
    "bm25_dismax_topk",
    "bm25_dismax_phys_topk",
    "bm25_dismax_pf_topk",
    "search_facet_lang",
    "lsh_candidates",
    "lsh_jaccard",
    "dedup_clusters",
    "embed_neardup",
    "simhash_neardup",
    "knn_ivf",
    "year_facet",
    "repetition_signals",
    "dedup_ngram_removal",
    "gopher_filter",
    "format_mixin_facet",
    "profile_battery",
    "url_dedup",
    "pii_redact",
    "c4_line_filter",
    "line_dedup",
    "decontaminate",
    "clean_funnel",
    "pagerank",
    "hash_split",
    "pack_shards",
    "lm_perplexity",
    "bpe_tokens",
    "webtext_pass",
    "quality_classifier",
    "semdedup_prune",
    "fuzzy_dedup_keep",
    "line_dedup_clean",
    "corpus_datacard",
    "domain_stats",
    "bpe_train_step",
    "bm25_fq_topk",
    "bm25_grouped_topk",
    "mlt_topk",
    "stats_component",
    "range_facet",
    "pivot_facet",
    "highlight_topk",
    "bm25_qstring_topk",
    "dsir_select",
    "dedup_incremental",
    "train_shuffle",
    "bm25_term_boost_phys_topk",
    "bm25_wildcard_phys_topk",
    "bm25_range_phys_topk",
    "pack_sequences",
    "snapshot_diff",
    "bm25_gen_topk",
    "select_request",
    "bm25_fq_phys_topk",
    "select_phys_request",
    "mlt_phys_topk",
    "terms_component_phys",
    "spellcheck_phys",
    "suggest_prefix_phys",
    "bm25_grouped_phys_topk",
    "training_pipeline",
    "select_facets_request",
    "bm25_elevate_phys_topk",
    "bm25_explain_phys_topk",
    "result_clusters_phys",
    "cached_page2",
    "select_sort_request",
    "select_dismax_request",
    "select_dismax_phys_request",
    "bm25_dismax_gen_topk",
    "select_cursor_request",
    "select_cursor_phys_request",
    "pack_shards_bpe",
    "temperature_bpe_plan",
    "select_matchall_phys_request",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from marc_solr_profiling_spark.queries import QUERIES
    from marc_solr_profiling_spark.session import get_spark

    spark = get_spark(
        app_name="bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    # warm the JVM + parquet footers once (not timed)
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    per_query: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()  # materialize the full result
        dt = time.time() - t0
        per_query[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.2f}s rows={n}", file=sys.stderr)

    # physical-index throughput: fresh build (docs/sec) + batch BM25 top-10
    # (queries/sec) over the salted varbyte segment index
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from marc_solr_profiling_spark.operators.wand import wand_topk_batch
    from marc_solr_profiling_spark.plans.build import build_index

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    idx_path = tempfile.mkdtemp(prefix="bench_idx_")
    try:
        t0 = time.time()
        idx = build_index(
            spark, docs, idx_path, key_col="doc_id", id_col="doc_id",
            chain="simple", n_salts=16, block_size=128,
        )
        build_sec = time.time() - t0
        per_query["index_build"] = round(build_sec, 3)
        total += build_sec

        terms = [
            r["term"]
            for r in idx.dictionary.orderBy(F.desc("df")).limit(60).collect()
        ]
        batch = [
            " ".join(terms[(3 * i + j) % len(terms)] for j in range(1 + i % 4))
            for i in range(50)
        ]
        t0 = time.time()
        wand_topk_batch(idx, batch, k=10).count()
        query_sec = time.time() - t0
        per_query["wand_batch_50"] = round(query_sec, 3)
        total += query_sec

        # sparse batch: 50 rare+hot queries with pairwise-disjoint terms
        # (every fan-in = 1) — the auto switch must route this to the
        # per-query block-max kernel and actually prune blocks. The flat
        # ~31-term documents vocabulary cannot express a sparse batch, so
        # this row uses the repo's deterministic Zipfian page generator
        # (same corpus as the physical-index test tier); the rare term
        # pins theta high and the hot term's blocks become prunable.
        from marc_solr_profiling_spark.corpus import generate_web_pages

        sparse_path = tempfile.mkdtemp(prefix="bench_idx_sparse_")
        try:
            pages = generate_web_pages(
                spark, 5000, seed=42, partitions=cpus
            ).cache()
            pages.count()
            sparse_idx = build_index(
                spark, pages, sparse_path, n_salts=8, block_size=16
            )
            hot = [
                r["term"]
                for r in sparse_idx.dictionary.orderBy(F.desc("df"))
                .limit(120).collect()
            ]
            rare = [
                r["term"]
                for r in sparse_idx.dictionary
                .filter(F.col("df").between(20, 200))
                .orderBy(F.asc("df")).limit(60).collect()
            ]
            n_pairs = min(50, len(rare), max(0, len(hot) - 20))
            sparse_batch = [
                f"{rare[i]} {hot[20 + i]}" for i in range(n_pairs)
            ]
            sparse_acc = spark.sparkContext.accumulator(0)
            t0 = time.time()
            wand_topk_batch(
                sparse_idx, sparse_batch, k=10, skip_acc=sparse_acc
            ).count()
            sparse_sec = time.time() - t0
            per_query["wand_batch_50_sparse"] = round(sparse_sec, 3)
            total += sparse_sec
            sparse_blocks_skipped = int(sparse_acc.value)
            pages.unpersist()
        finally:
            shutil.rmtree(sparse_path, ignore_errors=True)

        # block-max effectiveness: posting blocks pruned WITHOUT decoding on
        # a mixed rare+stopword multi-term query (VERDICT r1 done-criterion:
        # blocks_skipped > 0 on multi-term queries). The demo index uses
    # block_size=16 so block granularity relative to this 5k-doc corpus
        # matches production granularity (128-posting blocks vs 10^8-long
        # stopword lists); the query joins the corpus' one rare term with
        # two ~77%-df stopwords — the exact shape where round-1 decoded the
        # stopwords' entire posting lists.
        from marc_solr_profiling_spark.operators.wand import wand_topk

        demo_path = tempfile.mkdtemp(prefix="bench_idx_skip_")
        try:
            demo_idx = build_index(
                spark, docs, demo_path, key_col="doc_id", id_col="doc_id",
                chain="simple", n_salts=8, block_size=16,
            )
            rare = (
                demo_idx.dictionary.orderBy(F.asc("df")).limit(1)
                .collect()[0]["term"]
            )
            stops = [
                r["term"]
                for r in demo_idx.dictionary.orderBy(F.desc("df")).limit(2)
                .collect()
            ]
            acc = spark.sparkContext.accumulator(0)
            t0 = time.time()
            wand_topk(demo_idx, f"{rare} {' '.join(stops)}", k=10,
                      with_url=False, skip_acc=acc).count()
            per_query["wand_mixed_rare_stop_1"] = round(time.time() - t0, 3)
            blocks_skipped = int(acc.value)
        finally:
            shutil.rmtree(demo_path, ignore_errors=True)
    finally:
        shutil.rmtree(idx_path, ignore_errors=True)

    out = {
        "metric": "headline_query_wall_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        "index_build_docs_per_sec": round(n_docs / build_sec, 1),
        "bm25_topk_queries_per_sec": round(50 / query_sec, 2),
        "wand_blocks_skipped_multiterm": blocks_skipped,
        "wand_batch_sparse_blocks_skipped": sparse_blocks_skipped,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
