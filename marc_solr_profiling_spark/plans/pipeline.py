"""The end-to-end training-data pipeline: crawl table -> cleaned,
deduplicated, decontaminated, shard-packed corpus — the RefinedWeb /
FineWeb production shape, composed from the repo's verified operators
and committed stage-by-stage through the SAME manifest-gated store the
index build uses (``plans/lineage.py``), so a killed run resumes from
its last completed stage and every intermediate is an auditable
snapshot.

Stage order (each stage consumes the previous stage's SURVIVOR KEY SET —
key-only semi-joins; document text is scanned where a stage needs it but
never shuffled):

  1. ``exact``    one winner (min key) per md5(text) — cheapest per byte
  2. ``quality``  Gopher rule gate (textstats.gopher_quality_flags)
  3. ``fuzzy``    MinHash/LSH near-dup clusters, min-key representative
                  (operators/dedup.fuzzy_dedup_keep) — optional
  4. ``decontam`` benchmark n-gram decontamination
                  (operators/dedup.benchmark_decontaminate) — optional
  5. ``packed``   token-budget shard assignment over the final survivors
                  (operators/sampling.pack_shards, two-phase prefix sum)
  6. ``card``     per-stage funnel counts + total weight + shard count

Scale shape is inherited from the parts: exact dedup shuffles 16-byte
digests, the Gopher gate is one fused Arrow kernel, fuzzy dedup is
banded-LSH candidates only, decontamination is a broadcast-probe with
zero corpus shuffle, and packing is the two-phase distributed prefix
sum. The pipeline adds NO new shuffle of document text.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textstats import GOPHER_RULES, gopher_quality_flags
from ..operators.dedup import benchmark_decontaminate, fuzzy_dedup_keep
from ..operators.sampling import pack_shards
from .lineage import IndexStore, config_fingerprint


@dataclass
class TrainingData:
    """Handle to a committed pipeline run."""

    store: IndexStore
    spark: SparkSession
    key_col: str

    def survivors(self) -> DataFrame:
        """Final selected keys (one column)."""
        return self.store.read_stage(self.spark, "selected")

    def packed(self) -> DataFrame:
        """(key, weight, shard_id) of the final corpus."""
        return self.store.read_stage(self.spark, "packed")

    def card(self) -> DataFrame:
        """The data card: per-stage funnel counts + totals."""
        return self.store.read_stage(self.spark, "card")

    def select_docs(self, docs: DataFrame) -> DataFrame:
        """The surviving documents (semi-join against the key set)."""
        return docs.join(self.survivors(), self.key_col, "left_semi")


def build_training_data(
    spark: SparkSession,
    docs: DataFrame,
    out_path: str,
    key_col: str = "doc_id",
    text_col: str = "text",
    weight_col: str | None = None,
    stopwords=None,
    gopher_thresholds: dict | None = None,
    fuzzy: dict | None = None,
    benchmark: DataFrame | None = None,
    decontam_n: int = 5,
    decontam_max_hits: int = 0,
    tokens_per_shard: int = 50_000,
) -> TrainingData:
    """Run (or resume) the pipeline; every stage is manifest-gated.

    ``weight_col``: per-doc packing weight column (defaults to the
    analyzed token count via a length proxy if absent — pass ``n_chars``
    or a real token count). ``fuzzy``: kwargs for
    :func:`fuzzy_dedup_keep` or None to skip the stage. ``benchmark``:
    eval corpus for decontamination (None skips); a doc drops when it
    shares MORE than ``decontam_max_hits`` distinct n-grams with it.
    """
    store = IndexStore(out_path)
    store.set_fingerprint(config_fingerprint({
        "key_col": key_col, "weight_col": weight_col,
        "stopwords": list(stopwords or []),
        "gopher": dict(gopher_thresholds or {}),
        "fuzzy": dict(fuzzy or {}),
        "decontam_n": decontam_n, "decontam_max_hits": decontam_max_hits,
        "tokens_per_shard": tokens_per_shard,
        "version": 1,
    }))
    stage_names = []

    # 1. exact dedup — winner (min key) per content digest
    if not store.stage_complete("exact"):
        winners = (
            docs.groupBy(F.md5(F.col(text_col)).alias("h"))
            .agg(F.min(key_col).alias(key_col))
            .select(key_col)
        )
        store.commit_stage("exact", winners, partition_sort=[key_col])
    stage_names.append("exact")
    cur = docs.join(store.read_stage(spark, "exact"), key_col, "left_semi")

    # 2. Gopher quality gate
    if not store.stage_complete("quality"):
        flags = gopher_quality_flags(
            cur, key_col=key_col, text_col=text_col,
            stopwords=list(stopwords) if stopwords is not None else None,
            **(gopher_thresholds or {}))
        rejected = F.lit(False)
        for r in GOPHER_RULES:
            rejected = rejected | F.col(r)
        store.commit_stage(
            "quality", flags.filter(~rejected).select(key_col),
            partition_sort=[key_col])
    stage_names.append("quality")
    cur = docs.join(store.read_stage(spark, "quality"), key_col,
                    "left_semi")

    # 3. fuzzy near-dup (optional)
    if fuzzy is not None:
        if not store.stage_complete("fuzzy"):
            kept = fuzzy_dedup_keep(
                cur, key_col=key_col, text_col=text_col, **fuzzy)
            store.commit_stage(
                "fuzzy",
                kept.filter(F.col("kept")).select(key_col),
                partition_sort=[key_col])
        stage_names.append("fuzzy")
        cur = docs.join(store.read_stage(spark, "fuzzy"), key_col,
                        "left_semi")

    # 4. benchmark decontamination (optional)
    if benchmark is not None:
        if not store.stage_complete("decontam"):
            hits = benchmark_decontaminate(
                cur, benchmark, n=decontam_n, text_col=text_col,
                key_col=key_col)
            store.commit_stage(
                "decontam",
                hits.filter(
                    F.col("n_hit") <= int(decontam_max_hits)
                ).select(key_col),
                partition_sort=[key_col])
        stage_names.append("decontam")

    last = stage_names[-1]
    if not store.stage_complete("selected"):
        store.commit_stage(
            "selected", store.read_stage(spark, last),
            partition_sort=[key_col])

    # 5. shard packing over the final corpus
    if not store.stage_complete("packed"):
        sel = docs.join(store.read_stage(spark, "selected"), key_col,
                        "left_semi")
        if weight_col is None:
            sel = sel.withColumn("_w", F.length(text_col))
            wcol = "_w"
        else:
            wcol = weight_col
        store.commit_stage(
            "packed",
            pack_shards(sel.select(key_col, wcol), tokens_per_shard,
                        key_col=key_col, weight_col=wcol),
            partition_sort=[key_col])

    # 6. data card
    if not store.stage_complete("card"):
        counts = docs.agg(F.count("*").alias("n_0"))
        for i, st in enumerate(stage_names):
            counts = counts.crossJoin(
                store.read_stage(spark, st)
                .agg(F.count("*").alias(f"n_{i + 1}")))
        packed = store.read_stage(spark, "packed")
        totals = packed.agg(
            F.sum(F.col(packed.columns[1])).alias("_tw"),
            (F.max("shard_id") + 1).alias("_ns"))
        counts = counts.crossJoin(totals)
        names = ["input"] + stage_names
        stack_args = ", ".join(
            f"{i + 1}, '{nm}', n_{max(i - 1, 0)}, n_{i}"
            for i, nm in enumerate(names))
        card = counts.selectExpr(
            f"stack({len(names)}, {stack_args}) AS "
            "(stage_order, stage, n_in, n_kept)",
            "_tw", "_ns",
        ).select(
            F.col("stage_order").cast("int").alias("stage_order"),
            "stage",
            F.col("n_in").cast("long").alias("n_in"),
            F.col("n_kept").cast("long").alias("n_kept"),
            (F.col("n_in") - F.col("n_kept")).cast("long")
            .alias("n_dropped"),
            F.col("_tw").cast("long").alias("total_weight"),
            F.col("_ns").cast("long").alias("n_shards"),
        )
        store.commit_stage("card", card)

    return TrainingData(store, spark, key_col)
