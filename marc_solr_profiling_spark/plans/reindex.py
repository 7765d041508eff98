"""Re-index / dry-run extraction surface.

Spark restatement of the reference's index-as-source tools
(SURVEY.md §3.3):

* ``SolrReIndexer.handleAll`` (core/src/org/solrmarc/marc/
  SolrReIndexer.java:24-77, 88-89): query the index for STORED full
  records, re-run the extraction mapping, and add the updated docs back —
  used after a spec change, without touching the original source files.
  Here the "stored field" is the doc table plus the corpus' stored
  html/text payloads; re-indexing = re-running extraction + tokenize over
  the stored rows and MERGE-ing a fresh snapshot (incremental_update on
  every stored id == full upsert).

* ``MarcPrinter`` "index" mode (core/src/org/solrmarc/marc/
  MarcPrinter.java:117-180): DRY-RUN extraction — print the extracted
  fieldName -> value pairs per record without writing any index. Here a
  declarative spec {field -> Column} is evaluated and exploded to long
  (key, field, value) rows: the profiling surface a user diffs before
  committing a spec change, and the byte-identity check surface the north
  rule names (re-extracted text per url vs stored text).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .build import InvertedIndex, incremental_update


def dry_run_extract(
    records: DataFrame,
    spec: Mapping[str, Column],
    key_col: str = "record_id",
) -> DataFrame:
    """MarcPrinter "index"-mode analog: evaluate an extraction spec and
    emit long-format (key, field, value) rows, one per extracted value —
    multi-valued extractions (array columns) explode to one row each,
    null/empty extractions emit nothing (the reference prints only fields
    that produced values).

    One projection + one generator — no shuffle; the stack of per-field
    selects stays in a single whole-stage-codegen span.
    """
    from pyspark.sql import types as T

    named = records.select(
        F.col(key_col).alias("key"),
        *[col.alias(name) for name, col in spec.items()],
    )
    def _tagger(n):
        # arity-1 lambda: an arity-2 default-arg trick would make Spark
        # pass the array INDEX as the second argument
        return lambda v: F.struct(
            F.lit(n).alias("field"), v.cast("string").alias("value")
        )

    entries = []
    for f in named.schema.fields:
        if f.name == "key":
            continue
        if isinstance(f.dataType, T.ArrayType):
            entries.append(
                F.transform(
                    F.coalesce(F.col(f.name), F.array()), _tagger(f.name)
                )
            )
        else:
            entries.append(
                F.array(
                    F.struct(
                        F.lit(f.name).alias("field"),
                        F.col(f.name).cast("string").alias("value"),
                    )
                )
            )
    exploded = named.select(
        "key", F.explode(F.flatten(F.array(*entries))).alias("kv")
    )
    return (
        exploded.select("key", "kv.field", "kv.value")
        .filter(F.col("value").isNotNull() & (F.col("value") != ""))
    )


def reextract_text_check(
    stored: DataFrame,
    key_col: str = "url",
    html_col: str = "html",
    text_col: str = "text",
) -> DataFrame:
    """The north rule's per-url byte-identity surface: re-run the HTML
    extractor over the STORED html payload and compare against the stored
    text column. Returns (key, identical) — a healthy pipeline has
    identical=true for every row (assert in tests; at production scale
    aggregate ``filter(!identical).count()`` instead)."""
    from ..sources.html import extract_text_udf

    re_text = extract_text_udf()(F.col(html_col))
    return stored.select(
        F.col(key_col).alias("key"),
        (re_text.eqNullSafe(F.col(text_col))).alias("identical"),
    )


def reindex_from_store(
    spark: SparkSession,
    index: InvertedIndex,
    stored_docs: DataFrame,
    out_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_salts: int = 16,
    block_size: int = 128,
) -> InvertedIndex:
    """SolrReIndexer.handleAll analog: feed STORED documents back through
    the extraction+indexing pipeline and publish a new snapshot.

    ``stored_docs`` is the stored-field view (id + text payload — read
    back from the committed doc table joined to the corpus, or any
    subset). Every given id is upserted (mods win over base —
    MarcMerger semantics via incremental_update), so re-indexing the full
    id set is exactly a from-scratch rebuild expressed as a merge, and
    re-indexing a subset touches only those ids' postings."""
    return incremental_update(
        spark,
        index,
        out_path,
        delta_docs=stored_docs,
        text_col=text_col,
        id_col=id_col,
        n_salts=n_salts,
        block_size=block_size,
    )
