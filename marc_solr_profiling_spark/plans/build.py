"""Index build orchestration: docs -> docIDs -> tokens -> term freqs (+doc
lens) -> collection stats -> salted compressed segments — each stage a
committed, resumable snapshot (plans/lineage.py).

The Spark restatement of ``MarcImporter.handleAll`` (SURVEY.md §3.1): the
reference's single-threaded reader loop + Solr posts become a DAG of
declarative stages; its restartable per-id-range scripts become
manifest-gated stage resume; its commit/optimize becomes the snapshot
publish.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.analyzer import ANALYZERS
from ..operators.postings import with_tokens
from ..operators.segments import build_segments
from .lineage import IndexStore, config_fingerprint


def assign_doc_ids(docs: DataFrame, key_col: str = "url",
                   partitions: int | None = None) -> DataFrame:
    """Dense, deterministic numeric docIDs in key order (docid ascending ==
    url ascending, so docid tie-breaks equal the oracle's url tie-breaks).

    Scale shape: range-partition by key, sort within partitions, then
    per-partition offsets (computed from partition counts, a tiny driver
    list) + row_number *within* each partition. No single-partition global
    window — the classic distributed zip-with-index, all-DataFrame.
    """
    spark = docs.sparkSession
    parts = partitions or docs.sparkSession.sparkContext.defaultParallelism
    arranged = (
        docs.repartitionByRange(parts, key_col)
        .sortWithinPartitions(key_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    arranged = arranged.persist()
    counts = {
        r["_pid"]: r["n"]
        for r in arranged.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _offset long"
    )
    w = Window.partitionBy("_pid").orderBy(key_col)
    out = (
        arranged.join(F.broadcast(offset_df), "_pid")
        .withColumn(
            "doc_id", (F.col("_offset") + F.row_number().over(w) - 1).cast("long")
        )
        .drop("_pid", "_offset")
    )
    return out


class InvertedIndex:
    """Handle to a built physical index (paths + cached stats)."""

    def __init__(self, store: IndexStore, spark: SparkSession, chain: str):
        self.store = store
        self.spark = spark
        self.chain = chain
        stats = store.read_stage(spark, "stats").collect()[0]
        self.n_docs = int(stats["n_docs"])
        self.avgdl = float(stats["avgdl"])

    @property
    def segments(self) -> DataFrame:
        return self.store.read_stage(self.spark, "segments")

    @property
    def docs(self) -> DataFrame:
        return self.store.read_stage(self.spark, "docs")

    @property
    def dictionary(self) -> DataFrame:
        return self.store.read_stage(self.spark, "dictionary")


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    key_col: str = "url",
    text_col: str = "text",
    chain: str = "text",
    n_salts: int = 16,
    block_size: int = 128,
    partitions: int | None = None,
    id_col: str | None = None,
) -> InvertedIndex:
    """Build (or resume building) the physical index at ``path``.

    Stages (each a committed snapshot; a re-run skips completed ones):
      docs        (doc_id, url, doc_len)
      tf          (term, doc_id, tf, doc_len)
      stats       (n_docs, avgdl, total_tokens)  [1 row]
      dictionary  (term, df, cf)
      segments    (term, salt, block_id, ..., doc_gaps, tfs, max_wnorm)

    ``id_col``: pass the name of an existing unique numeric column to use
    it as doc_id directly (skips the assignment sort); otherwise dense ids
    are assigned in ``key_col`` order.
    """
    store = IndexStore(path)
    store.set_fingerprint(
        config_fingerprint(
            {
                "chain": chain,
                "n_salts": n_salts,
                "block_size": block_size,
                "key_col": key_col,
                "id_col": id_col,
                "version": 1,
            }
        )
    )

    if not store.stage_complete("tf"):
        if id_col is not None:
            with_ids = docs.withColumn("doc_id", F.col(id_col).cast("long"))
        else:
            with_ids = assign_doc_ids(docs, key_col=key_col, partitions=partitions)
        toks = with_tokens(with_ids, text_col=text_col, chain=chain)
        toks = toks.withColumn(
            "doc_len", F.size(F.coalesce(F.col("tokens"), F.array()))
        )
        # tokenization (the pandas-UDF stage) feeds two sinks — persist so
        # the analyzer runs once per doc, not once per downstream action
        toks = toks.persist()
        doc_cols = ["doc_id", "doc_len"] if key_col == "doc_id" else [
            "doc_id", key_col, "doc_len"
        ]
        doc_tbl = toks.select(*doc_cols)
        store.commit_stage("docs", doc_tbl,
                           repartition_range=["doc_id"],
                           partition_sort=["doc_id"])
        tf = (
            toks.select("doc_id", "doc_len", F.explode("tokens").alias("term"))
            .groupBy("term", "doc_id", "doc_len")
            .agg(F.count("*").cast("int").alias("tf"))
        )
        store.commit_stage("tf", tf)
        toks.unpersist()

    tf = store.read_stage(spark, "tf")

    if not store.stage_complete("stats"):
        ds = store.read_stage(spark, "docs")
        stats = ds.agg(
            F.count("*").alias("n_docs"),
            F.avg("doc_len").alias("avgdl"),
            F.sum("doc_len").alias("total_tokens"),
        )
        store.commit_stage("stats", stats)

    if not store.stage_complete("dictionary"):
        dictionary = tf.groupBy("term").agg(
            F.count("*").alias("df"), F.sum("tf").alias("cf")
        )
        store.commit_stage("dictionary", dictionary,
                           repartition_range=["term"],
                           partition_sort=["term"])

    if not store.stage_complete("segments"):
        avgdl = float(store.read_stage(spark, "stats").collect()[0]["avgdl"])
        segs = build_segments(
            tf.select("term", "doc_id", "tf", "doc_len"),
            avgdl=avgdl,
            n_salts=n_salts,
            block_size=block_size,
        )
        # range-partition + sort by term: parquet row-group min/max on term
        # turns query-term filters into row-group pruning (the Iceberg
        # sort-order analog).
        store.commit_stage("segments", segs,
                           repartition_range=["term"],
                           partition_sort=["term", "salt", "block_id"])

    return InvertedIndex(store, spark, chain)
