"""Pre-generate the deterministic scaling corpus once (unpinned, full host
parallelism) so each pinned measurement JVM reads identical input instead
of paying corpus generation inside its core budget.

Usage: python tools/gen_corpus.py <n_docs> <out_dir>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1])
    out_dir = sys.argv[2]
    from marc_solr_profiling_spark.corpus import generate_web_pages
    from marc_solr_profiling_spark.session import get_spark

    spark = get_spark(app_name="gen_corpus")
    generate_web_pages(spark, n_docs, seed=42, partitions=256).write.mode(
        "overwrite"
    ).option("parquet.enable.dictionary", "false").parquet(out_dir)
    print(out_dir)


if __name__ == "__main__":
    main()
