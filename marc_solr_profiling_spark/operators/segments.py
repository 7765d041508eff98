"""Physical posting segments: salted, blocked, varbyte-compressed.

The physical analog of Lucene's per-segment inverted index that the
reference writes through Solr (``solrconfig.xml:14`` NRTCachingDirectory,
autoCommit micro-batches ``solrconfig.xml:30-33``). Layout per north_rule:

    segment row = (term, salt, block_id, n_postings, first_doc, last_doc,
                   doc_gaps: binary /* delta+varbyte docIDs */,
                   tfs: binary /* varbyte term freqs */,
                   dls: binary /* varbyte doc lengths — per-posting norm,
                                  so scoring is block-local (no doc join) */,
                   max_wnorm: double /* per-block max of the idf-independent
                                        BM25 factor — block-max metadata */)

- ``salt`` = hash(doc_id) % n_salts. Salting serves two purposes:
  (1) build-time skew diffusion — a web-scale stopword's postings split
  into n_salts groups, so no single applyInPandas task materializes the
  whole 'the' posting list (SURVEY.md §7 risk 3);
  (2) query-time doc-partitioned parallelism — ALL query terms' postings
  for a given doc share its salt, so per-salt partitions can score
  independently with a bounded top-k heap and merge k rows each (wand.py).
- blocks of ``block_size`` postings, docIDs sorted ascending within a
  (term, salt) group, so gaps are small and block [first_doc, last_doc]
  ranges enable skipping.
- ``max_wnorm`` = max over the block of
      tf * (k1+1) / (tf + k1 * (1 - b + b * dl / avgdl))
  i.e. the BM25 term score WITHOUT idf; query-time upper bound for the
  block = idf(term) * max_wnorm (block-max metadata).

The group aggregation runs as groupBy(term, salt).applyInPandas with numpy
varbyte (operators/varbyte.py) — no per-row Python.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..oracle import B, K1
from .varbyte import delta_encode, varbyte_encode

SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("salt", T.IntegerType(), False),
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("n_postings", T.IntegerType(), False),
        T.StructField("first_doc", T.LongType(), False),
        T.StructField("last_doc", T.LongType(), False),
        T.StructField("doc_gaps", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        T.StructField("dls", T.BinaryType(), False),
        T.StructField("max_wnorm", T.DoubleType(), False),
    ]
)


def build_segments(
    tf_with_dl: DataFrame,
    avgdl: float,
    n_salts: int = 16,
    block_size: int = 128,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """tf_with_dl: (term, doc_id:long, tf:int, doc_len:int) ->
    segment block rows.

    Shuffle shape: one repartition on (term, salt) — the salted groupBy.
    With n_salts=16 the largest group is ~1/16 of the hottest term's
    postings; raise n_salts with corpus size (it's a pure metadata change,
    queries read salt from the rows).
    """

    def make_blocks(batches) -> "pd.DataFrame":
        # One call per PARTITION (mapInPandas), not per group: with a web
        # vocabulary most (term, salt) groups are tiny, and per-group
        # applyInPandas overhead (~1 ms of Arrow/pandas setup per group)
        # dominates the build. Rows arrive sorted by (term, salt, doc_id);
        # group boundaries are numpy change-point detection, encode loops
        # touch only numpy slices.
        lst = list(batches)
        if not lst:
            return
        pdf = pd.concat(lst, ignore_index=True)
        terms = pdf["term"].to_numpy()
        salts = pdf["salt"].to_numpy()
        doc_ids = pdf["doc_id"].to_numpy().astype(np.uint64)
        tfs = pdf["tf"].to_numpy().astype(np.float64)
        dls = pdf["doc_len"].to_numpy().astype(np.float64)
        wnorm = tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dls / avgdl))
        n = len(pdf)
        change = np.ones(n, dtype=bool)
        if n > 1:
            change[1:] = (terms[1:] != terms[:-1]) | (salts[1:] != salts[:-1])
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        rows = []
        for gs, ge in zip(starts, ends):
            term = terms[gs]
            salt = int(salts[gs])
            for blk, s in enumerate(range(gs, ge, block_size)):
                e = min(s + block_size, ge)
                ids = doc_ids[s:e]
                rows.append(
                    (
                        term,
                        salt,
                        blk,
                        int(e - s),
                        int(ids[0]),
                        int(ids[-1]),
                        delta_encode(ids),
                        varbyte_encode(tfs[s:e].astype(np.uint64)),
                        varbyte_encode(dls[s:e].astype(np.uint64)),
                        float(wnorm[s:e].max()),
                    )
                )
        yield pd.DataFrame(rows, columns=[f.name for f in SEGMENT_SCHEMA.fields])

    salted = tf_with_dl.withColumn(
        "salt", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_salts)).cast("int")
    )
    arranged = salted.repartition("term", "salt").sortWithinPartitions(
        "term", "salt", "doc_id"
    )
    return arranged.mapInPandas(make_blocks, schema=SEGMENT_SCHEMA)


def decode_blocks_to_postings(
    blocks: pd.DataFrame,
) -> Iterator[tuple[str, np.ndarray, np.ndarray, float]]:
    """Yield (term, doc_ids, tfs, max_wnorm) per block — shared by the
    query scorer and the round-trip tests."""
    from .varbyte import delta_decode, varbyte_decode

    for row in blocks.itertuples(index=False):
        yield (
            row.term,
            delta_decode(row.doc_gaps),
            varbyte_decode(row.tfs),
            float(row.max_wnorm),
        )
