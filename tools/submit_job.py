"""spark-submit entry point — the remote-deploy analog of the reference's
HTTP SolrServer path (``SolrCoreLoader.java:26,160``; the sandbox's
local[N] sessions are the EmbeddedSolrServer analog).

Run on a cluster (the north rule's deployment shape):

    zip -r msps.zip marc_solr_profiling_spark
    spark-submit --py-files msps.zip tools/submit_job.py build \\
        <docs_parquet_or_table> <index_path> [--key-col url] [--text-col text] \\
        [--chain text] [--n-salts 256] [--block-size 128]
    spark-submit --py-files msps.zip tools/submit_job.py query \\
        <index_path> "<query string>" [--k 10]
    spark-submit --py-files msps.zip tools/submit_job.py batch \\
        <index_path> <queries_file> [--k 10] [--out <parquet_path>]

``get_spark()`` detects a cluster-manager-provided ``spark.master`` and
does not override it, so the SAME code runs embedded (local[N]) and remote
(YARN/K8s/standalone) — deploy mode is configuration, not code.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("docs")
    b.add_argument("index_path")
    b.add_argument("--key-col", default="url")
    b.add_argument("--id-col", default=None)
    b.add_argument("--text-col", default="text")
    b.add_argument("--chain", default="text")
    b.add_argument("--n-salts", type=int, default=256)
    b.add_argument("--block-size", type=int, default=128)

    q = sub.add_parser("query")
    q.add_argument("index_path")
    q.add_argument("query")
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--min-match", type=int, default=1)
    q.add_argument("--chain", default="text",
                   help="analyzer chain the index was built with")

    bt = sub.add_parser("batch")
    bt.add_argument("index_path")
    bt.add_argument("queries_file")
    bt.add_argument("--k", type=int, default=10)
    bt.add_argument("--out", default=None)
    bt.add_argument("--chain", default="text")

    args = ap.parse_args()

    from marc_solr_profiling_spark.plans.build import InvertedIndex, build_index
    from marc_solr_profiling_spark.plans.lineage import IndexStore
    from marc_solr_profiling_spark.session import get_spark

    spark = get_spark(app_name=f"msps_{args.cmd}")

    if args.cmd == "build":
        docs = (
            spark.read.table(args.docs)
            if "/" not in args.docs and "." in args.docs
            else spark.read.parquet(args.docs)
        )
        idx = build_index(
            spark, docs, args.index_path,
            key_col=args.key_col, id_col=args.id_col,
            text_col=args.text_col, chain=args.chain,
            n_salts=args.n_salts, block_size=args.block_size,
        )
        print(f"built: n_docs={idx.n_docs} avgdl={idx.avgdl:.2f}")
        return

    idx = InvertedIndex(IndexStore(args.index_path), spark, args.chain)
    if args.cmd == "query":
        from marc_solr_profiling_spark.operators.wand import wand_topk

        wand_topk(idx, args.query, k=args.k,
                  min_match=args.min_match).show(args.k, truncate=False)
    else:
        from marc_solr_profiling_spark.operators.wand import wand_topk_batch

        with open(args.queries_file) as f:
            queries = [ln.strip() for ln in f if ln.strip()]
        out = wand_topk_batch(idx, queries, k=args.k)
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        else:
            print(f"results: {out.count()} rows")


if __name__ == "__main__":
    main()
