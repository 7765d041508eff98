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
        # generation chain, newest first (append_delta_multifield) —
        # same model as plans/build.py InvertedIndex
        self.stores = [self.store]
        seen = {self.store.path}
        parent = meta.get("parent")
        while parent:
            if parent in seen:
                raise ValueError(f"generation chain cycle at {parent}")
            seen.add(parent)
            ps = IndexStore(parent)
            self.stores.append(ps)
            parent = ps.get_meta().get("parent")

    def _gen_field_avgdl(self, store: IndexStore) -> dict:
        """Per-field avgdl a generation's caps were built with."""
        v = store.get_meta().get("built_field_avgdl")
        if v:
            return {str(k): float(x) for k, x in v.items()}
        return {r["field"]: float(r["avgdl"])
                for r in store.read_stage(self.spark, "stats").collect()}

    @property
    def segments(self) -> DataFrame:
        if len(self.stores) == 1:
            return self.store.read_stage(self.spark, "segments")
        # per-FIELD cap rescaling under corpus drift (the single-field
        # chain's avgdl argument, applied per field since each field has
        # its own avgdl): scale_f = max(1, avgdl_now_f / avgdl_built_f),
        # selected by the term-key's field prefix
        parts = []
        for st in self.stores:
            seg = st.read_stage(self.spark, "segments")
            built = self._gen_field_avgdl(st)
            scale_expr = None
            needs = False
            fld = F.substring_index(F.col("term"), self.sep, 1)
            for fname, (_, avgdl_now) in self.field_stats.items():
                s = avgdl_now / max(built.get(fname, avgdl_now), 1e-12)
                if s > 1.0:
                    needs = True
                cond = F.when(fld == fname, F.lit(float(max(1.0, s))))
                scale_expr = (cond if scale_expr is None
                              else scale_expr.when(
                                  fld == fname, F.lit(float(max(1.0, s)))))
            if needs and scale_expr is not None:
                seg = seg.withColumn(
                    "max_wnorm",
                    F.col("max_wnorm") * scale_expr.otherwise(F.lit(1.0)))
            parts.append(seg)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out

    @property
    def docs(self) -> DataFrame:
        if len(self.stores) == 1:
            return self.store.read_stage(self.spark, "docs")
        out = None
        for st in self.stores:
            d = st.read_stage(self.spark, "docs")
            out = d if out is None else out.unionByName(
                d, allowMissingColumns=True)
        dels = self.deletes_df()
        if dels is not None:
            out = out.join(F.broadcast(dels), "doc_id", "left_anti")
        return out

    def live_tf(self) -> DataFrame:
        out = None
        for st in self.stores:
            t = st.read_stage(self.spark, "tf")
            out = t if out is None else out.unionByName(t)
        dels = self.deletes_df()
        if dels is not None:
            out = out.join(F.broadcast(dels), "doc_id", "left_anti")
        return out

    def deletes_df(self) -> DataFrame | None:
        if self.store.stage_complete("deletes"):
            return self.store.read_stage(self.spark, "deletes")
        return None

    def deleted_array(self):
        """Sorted tombstone ids for kernel masking (see
        plans/build.py InvertedIndex.deleted_array)."""
        if hasattr(self, "_del_arr"):
            return self._del_arr
        import numpy as np

        dels = self.deletes_df()
        if dels is None:
            self._del_arr = None
        else:
            arr = np.sort(np.asarray(
                [r["doc_id"] for r in dels.select("doc_id").collect()],
                dtype=np.int64))
            self._del_arr = arr if arr.size else None
        return self._del_arr

    def del_postings(self) -> DataFrame | None:
        """Index-resident tombstone postings (see plans/build.py
        InvertedIndex.del_postings)."""
        if self.store.stage_complete("del_segments"):
            return self.store.read_stage(self.spark, "del_segments")
        return None

    def n_deletes(self) -> int:
        if not self.store.stage_complete("deletes"):
            return 0
        try:
            return int(self.store.lineage()["stages"]["deletes"]["rows"])
        except (KeyError, TypeError, ValueError):
            return int(self.deletes_df().count())

    def delete_masks(self):
        """(array, postings) with at most one non-None — small sets ship
        as a driver array, large sets stay index-resident per salt (see
        plans/build.py InvertedIndex.delete_masks)."""
        dels = self.deletes_df()
        if dels is None:
            return None, None
        cap = int(self.spark.conf.get("spark.marc.delArrayMaxIds",
                                      "262144"))
        tbl = self.del_postings()
        if tbl is not None and self.n_deletes() > cap:
            return None, tbl
        return self.deleted_array(), None

    @property
    def filters(self) -> DataFrame | None:
        """Unscored fq filter postings (``filter_cols`` build option) —
        same contract as the single-field index's ``filters`` stage
        (chain: every generation must carry it, else None)."""
        parts = []
        for st in self.stores:
            if not st.stage_complete("filters"):
                return None
            parts.append(st.read_stage(self.spark, "filters"))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out

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
        "field_limits": {n: lim for n, lim in field_list},
        "multifield": True,
    })

    persisted: list = []
    with_ids = None
    need_filters = bool(filter_cols) and not store.stage_complete("filters")
    if not store.stage_complete("tf") or need_filters or (
            key_col != "doc_id" and not store.stage_complete("docs")):
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
        # give (doc_id) with no dedup shuffle; the external key column
        # rides along when distinct from doc_id (generational appends
        # upsert by it)
        f0 = field_list[0][0]
        doc_tbl = tf.filter(F.col("field") == f0).select("doc_id")
        if key_col != "doc_id" and with_ids is not None:
            doc_tbl = doc_tbl.join(
                with_ids.select("doc_id", key_col), "doc_id")
        store.commit_stage("docs", doc_tbl, partition_sort=["doc_id"])

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

    if "built_field_avgdl" not in store.get_meta():
        store.set_meta({
            "built_field_avgdl": {
                r["field"]: float(r["avgdl"])
                for r in store.read_stage(spark, "stats").collect()
            },
            "key_col": key_col,
            "filter_cols": list(filter_cols or []),
        })

    return MultiFieldIndex(store, spark, chain)


def open_multifield_index(spark: SparkSession, path: str) -> MultiFieldIndex:
    """Re-open a committed multi-field index (or generation-chain head)
    from its store directory — fields, separator and build parameters
    come from the manifest (the multifield twin of
    ``plans/build.py open_index``)."""
    store = IndexStore(path)
    chain = store.get_meta().get("chain", "text")
    return MultiFieldIndex(store, spark, chain)
