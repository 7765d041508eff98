"""Multi-field physical index build — the edismax ``qf`` substrate.

The reference's default search handler queries SEVERAL fields per term
with per-field boosts and a tie-breaker (``profiling/solr/conf/
solrconfig.xml:64-83``: edismax ``qf``/``tie``); Lucene backs that with a
field-scoped term dictionary and per-field norms (a ``title:spark``
posting list is distinct from ``body:spark``, and each field has its own
doc lengths / avgdl / df).

This build re-expresses that as a FIELD-PREFIXED TERM KEY over the
existing packed salted segment machinery (plans/build.py): one fused
tokenize pass per doc serves every field (the copyField pattern — fields
are token-limit views of the same analyzed stream), each (doc, field)
emits one packed row, per-field collection stats come from a tiny
groupBy(field), and the segment blocks carry per-field block-max norms
(``build_segments_packed(avgdl_col=...)``). Everything downstream —
salting, exact routing, varbyte blocks, dictionary df/cf — is the
single-field code verbatim, so the multi-field index inherits its scale
shape: one full-volume shuffle (packed rows by salt), skew-immune at the
exchange, computed partition placement.

Query side: ``operators.wand.dismax_topk`` — per-term
``max_f + tie * (sum_f - max_f)`` over boosted per-field BM25 scores
(DisjunctionMaxQuery), with block-max pruning kept exact under the
conservative sum bound (tie <= 1 implies dismax <= sum of field scores).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.postings import tokenize_and_count_packed_fields
from ..operators.segments import build_segments_packed
from .build import _resolve_range_buckets, assign_doc_ids
from .lineage import IndexStore, config_fingerprint

FIELD_SEP = "\x1f"


class MultiFieldIndex:
    """Handle to a built multi-field index: same duck-typed surface the
    block-max scorer uses (``spark``, ``n_salts``, ``segments``,
    ``cached_dictionary``) plus per-field collection stats."""

    def __init__(self, store: IndexStore, spark: SparkSession, chain: str):
        self.store = store
        self.spark = spark
        self.chain = chain
        meta = store.get_meta()
        self.n_salts = int(meta.get("n_salts", 16))
        self.sep = meta.get("field_sep", FIELD_SEP)
        self.fields = list(meta.get("fields", []))
        # per-field (n_docs, avgdl) — a handful of rows, driver-resident
        self.field_stats = {
            r["field"]: (int(r["n_docs"]), float(r["avgdl"]))
            for r in store.read_stage(spark, "stats").collect()
        }

    @property
    def segments(self) -> DataFrame:
        return self.store.read_stage(self.spark, "segments")

    @property
    def docs(self) -> DataFrame:
        return self.store.read_stage(self.spark, "docs")

    @property
    def filters(self) -> DataFrame | None:
        """Unscored fq filter postings (``filter_cols`` build option) —
        same contract as the single-field index's ``filters`` stage."""
        if self.store.stage_complete("filters"):
            return self.store.read_stage(self.spark, "filters")
        return None

    @property
    def dictionary(self) -> DataFrame:
        return self.store.read_stage(self.spark, "dictionary")

    def cached_dictionary(self) -> DataFrame:
        cached = getattr(self, "_dict_cached", None)
        if cached is None:
            cached = self.dictionary.persist()
            self._dict_cached = cached
        return cached


def build_multifield_index(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    fields,
    key_col: str = "doc_id",
    text_col: str = "text",
    chain: str = "simple",
    n_salts: int = 16,
    block_size: int = 128,
    partitions: int | None = None,
    id_col: str | None = None,
    range_buckets: int | str = "auto",
    filter_cols=None,
) -> MultiFieldIndex:
    """Build (or resume) a multi-field physical index at ``path``.

    ``fields``: sequence of ``(name, token_limit)`` — each field is the
    analyzed ``text_col`` stream truncated to its first ``token_limit``
    tokens (``None`` = whole stream). See module docstring.

    Stages (manifest-gated like plans/build.py):
      tf          packed per-(doc, field) postings, terms field-prefixed
      stats       (field, n_docs, avgdl, total_tokens) — one row per field
      docs        (doc_id[, key]) — one row per doc
      segments    salted varbyte blocks, per-field block-max norms
      dictionary  (term=field<sep>term, df, cf) — per-field df by key
    """
    field_list = [(str(n), lim) for n, lim in fields]
    store = IndexStore(path)
    store.set_fingerprint(
        config_fingerprint(
            {
                "chain": chain,
                "n_salts": n_salts,
                "block_size": block_size,
                "key_col": key_col,
                "id_col": id_col,
                "fields": field_list,
                "filter_cols": list(filter_cols or []),
                "version": 1,  # multifield v1
            }
        )
    )
    store.set_meta({
        "n_salts": n_salts, "chain": chain, "block_size": block_size,
        "fields": [n for n, _ in field_list], "field_sep": FIELD_SEP,
        "multifield": True,
    })

    persisted: list = []
    with_ids = None
    need_filters = bool(filter_cols) and not store.stage_complete("filters")
    if not store.stage_complete("tf") or need_filters:
        if id_col is not None:
            with_ids = docs.withColumn("doc_id", F.col(id_col).cast("long"))
        else:
            with_ids = assign_doc_ids(
                docs, key_col=key_col, partitions=partitions,
                _persist_handle=persisted,
            )
    if not store.stage_complete("tf"):
        tf = tokenize_and_count_packed_fields(
            with_ids, field_list, key_col="doc_id", text_col=text_col,
            chain=chain, sep=FIELD_SEP,
        )
        store.commit_stage("tf", tf)

    if need_filters:
        # metadata fq bitsets — same stage contract as the single-field
        # build (plans/build.py); the edismax handler's fq clauses
        # intersect these inside the dismax kernel
        from .build import _filter_packed

        store.commit_stage(
            "filters",
            build_segments_packed(
                _filter_packed(with_ids, filter_cols), avgdl=1.0,
                n_salts=n_salts, block_size=block_size,
            ),
        )

    tf = store.read_stage(spark, "tf")

    if not store.stage_complete("stats"):
        # per-field collection stats: every doc emits a row per field
        # (empty docs included), so count/avg over the packed rows is
        # exactly Lucene's per-field n_docs/avgdl
        store.commit_stage(
            "stats",
            tf.groupBy("field").agg(
                F.count("*").alias("n_docs"),
                F.avg("doc_len").alias("avgdl"),
                F.sum("doc_len").alias("total_tokens"),
            ),
        )

    if not store.stage_complete("docs"):
        # one packed row per doc within any single field — field 0's rows
        # give (doc_id) with no dedup shuffle
        f0 = field_list[0][0]
        store.commit_stage(
            "docs",
            tf.filter(F.col("field") == f0).select("doc_id"),
            partition_sort=["doc_id"],
        )

    if not store.stage_complete("segments"):
        favg = store.read_stage(spark, "stats").select(
            "field", F.col("avgdl").alias("_favgdl")
        )
        n_rows = int(store.lineage()["stages"]["tf"]["rows"])
        segs = build_segments_packed(
            tf.join(F.broadcast(favg), "field"),
            avgdl=0.0,  # ignored: per-row _favgdl below
            n_salts=n_salts,
            block_size=block_size,
            range_buckets=_resolve_range_buckets(
                range_buckets, spark, n_salts, n_rows // max(1, len(field_list)),
            ),
            avgdl_col="_favgdl",
        )
        store.commit_stage("segments", segs)

    for cached in persisted:
        cached.unpersist()

    if not store.stage_complete("dictionary"):
        segs_tbl = store.read_stage(spark, "segments")
        store.commit_stage(
            "dictionary",
            segs_tbl.groupBy("term").agg(
                F.sum("n_postings").alias("df"), F.sum("tf_sum").alias("cf")
            ),
            partition_sort=["term"],
        )

    return MultiFieldIndex(store, spark, chain)
