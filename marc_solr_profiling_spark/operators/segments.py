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
        T.StructField("tf_sum", T.LongType(), False),
    ]
)

# positional variant (Lucene .pos analog): per block, the concatenation of
# each posting's delta+varbyte position payload, in posting order — the
# per-posting payload lengths are recovered at decode time from the tfs
SEGMENT_SCHEMA_POS = T.StructType(
    SEGMENT_SCHEMA.fields + [T.StructField("positions", T.BinaryType(), False)]
)


def _blocks_from_arrays(
    terms: np.ndarray,
    salts: np.ndarray,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    pos_arr,
    avgdl,
    block_size: int,
    k1: float,
    b: float,
) -> dict:
    """Partition-wide block construction from flat posting arrays (shared
    by the exploded-row and packed-row kernels). Sorts (term, salt,
    doc_id) on factorized int codes, finds group/block boundaries by
    change-point detection, and computes gaps/varbyte/caps in single
    vectorized passes — see build_segments for the full rationale."""
    from .varbyte import delta_gaps_blocked, varbyte_encode_sliced

    n = terms.shape[0]
    with_pos = pos_arr is not None
    codes, uniques = pd.factorize(terms)
    rank = np.empty(len(uniques), dtype=np.int64)
    rank[np.argsort(uniques, kind="stable")] = np.arange(len(uniques))
    order = np.lexsort((doc_ids, salts, rank[codes]))
    terms = terms[order]
    salts = salts[order]
    doc_ids = doc_ids[order]
    tfs = tfs[order]
    dls = dls[order]
    if with_pos:
        pos_arr = pos_arr[order]
    if isinstance(avgdl, np.ndarray):
        # per-posting avgdl (multi-field build: each field has its own
        # collection average, like Lucene's per-field norms)
        avgdl = avgdl[order]
    wnorm = tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dls / avgdl))
    change = np.ones(n, dtype=bool)
    if n > 1:
        change[1:] = (terms[1:] != terms[:-1]) | (salts[1:] != salts[:-1])
    g_starts = np.flatnonzero(change)
    g_ends = np.append(g_starts[1:], n)
    sizes = g_ends - g_starts
    nblk = -(-sizes // block_size)  # ceil
    grp_of_blk = np.repeat(np.arange(g_starts.size), nblk)
    blk_offsets = np.concatenate(([0], np.cumsum(nblk)[:-1]))
    block_id = np.arange(grp_of_blk.size) - blk_offsets[grp_of_blk]
    b_starts = g_starts[grp_of_blk] + block_id * block_size
    b_ends = np.minimum(b_starts + block_size, g_ends[grp_of_blk])

    tf_cum = np.concatenate(([0.0], np.cumsum(tfs)))
    tf_sum = (tf_cum[b_ends] - tf_cum[b_starts]).astype(np.int64)
    gaps = delta_gaps_blocked(doc_ids, b_starts)
    doc_gaps = varbyte_encode_sliced(gaps, b_starts, b_ends)
    tf_bytes = varbyte_encode_sliced(tfs.astype(np.uint64), b_starts, b_ends)
    dl_bytes = varbyte_encode_sliced(dls.astype(np.uint64), b_starts, b_ends)
    max_w = np.maximum.reduceat(wnorm, b_starts)

    out = {
        "term": terms[b_starts],
        "salt": salts[b_starts].astype(np.int32),
        "block_id": block_id.astype(np.int32),
        "n_postings": (b_ends - b_starts).astype(np.int32),
        "first_doc": doc_ids[b_starts].astype(np.int64),
        "last_doc": doc_ids[b_ends - 1].astype(np.int64),
        "doc_gaps": doc_gaps,
        "tfs": tf_bytes,
        "dls": dl_bytes,
        "max_wnorm": max_w,
        "tf_sum": tf_sum,
    }
    if with_pos:
        out["positions"] = [
            b"".join(pos_arr[s:e])
            for s, e in zip(b_starts.tolist(), b_ends.tolist())
        ]
    return out


def build_segments(
    tf_with_dl: DataFrame,
    avgdl: float,
    n_salts: int = 16,
    block_size: int = 128,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """tf_with_dl: (term, doc_id:long, tf:int, doc_len:int[, pos:binary]) ->
    segment block rows.

    Shuffle shape: one repartition on (term, salt) — the salted groupBy.
    With n_salts=16 the largest group is ~1/16 of the hottest term's
    postings; raise n_salts with corpus size (it's a pure metadata change,
    queries read salt from the rows).

    When a ``pos`` column is present (positional build — see
    ``tokenize_and_count(positions=True)``), each block additionally
    carries ``positions``: its postings' already-varbyte position payloads
    concatenated in posting order. The payloads were encoded in the
    tokenize kernel, so here they are only REARRANGED (bytes join per
    block) — never re-encoded.
    """

    def make_blocks(batches) -> "pd.DataFrame":
        # One call per PARTITION (mapInPandas), not per group, and ONE
        # vectorized encode pass per partition, not per block: with a web
        # vocabulary most (term, salt) groups are tiny, so per-group/-block
        # numpy dispatch (~µs each × millions) would dominate the build.
        # Rows arrive hash-partitioned by (term, salt) but UNSORTED; the
        # sort happens below in numpy. Group boundaries are then numpy
        # change-point detection; block boundaries, delta gaps and varbyte
        # bytes are all computed partition-wide and sliced.
        lst = list(batches)
        if not lst:
            return
        pdf = pd.concat(lst, ignore_index=True)
        if len(pdf) == 0:
            return
        # partition-wide (term, salt, doc_id) sort happens inside
        # _blocks_from_arrays, not as a JVM sortWithinPartitions:
        # factorize to int codes, rank the (small) distinct-term set
        # lexicographically, then one integer lexsort — O(n) hashing +
        # O(V log V) string sort + O(n log n) int sort beats Tungsten's
        # per-row UTF8 comparisons, and the rows were crossing into this
        # worker anyway. Output stays term-sorted, so parquet row-group
        # min/max pruning on query terms is preserved.
        yield pd.DataFrame(
            _blocks_from_arrays(
                pdf["term"].to_numpy(),
                pdf["salt"].to_numpy(),
                pdf["doc_id"].to_numpy().astype(np.uint64),
                pdf["tf"].to_numpy().astype(np.float64),
                pdf["doc_len"].to_numpy().astype(np.float64),
                pdf["pos"].to_numpy() if with_pos else None,
                avgdl, block_size, k1, b,
            )
        )

    with_pos = "pos" in tf_with_dl.columns
    # drop zero-token sentinel rows emitted by the fused tokenize+count pass
    tf_with_dl = tf_with_dl.filter(
        F.col("term").isNotNull() & (F.col("tf") > 0)
    )
    salted = tf_with_dl.withColumn(
        "salt", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_salts)).cast("int")
    )
    # no JVM sortWithinPartitions: make_blocks lexsorts inside the Python
    # worker on factorized int codes (see comment there)
    arranged = salted.repartition("term", "salt")
    schema = SEGMENT_SCHEMA_POS if with_pos else SEGMENT_SCHEMA
    return arranged.mapInPandas(make_blocks, schema=schema)


def build_segments_packed(
    packed: DataFrame,
    avgdl: float,
    n_salts: int = 16,
    block_size: int = 128,
    key_col: str = "doc_id",
    k1: float = K1,
    b: float = B,
    range_buckets: int = 1,
    avgdl_col: str | None = None,
) -> DataFrame:
    """Segment blocks from PACKED per-doc postings
    (``tokenize_and_count_packed`` rows) — the scale path.

    Shuffle shape: ONE repartition of per-doc rows by salt. A doc's
    postings all carry ``salt = xxhash64(doc_id) % n_salts``, so routing
    whole docs by salt preserves the invariant the kernel (and the query
    scorer) needs — every (term, salt) group lands complete in exactly one
    partition — while moving ~3x fewer bytes and ~2 orders of magnitude
    fewer rows than the exploded (term, doc, tf) form: the doc id, doc
    length and hot-term strings are never repeated per posting. Term skew
    is gone entirely at the exchange: partitions hold equal doc shares
    regardless of the term distribution (a stopword's postings spread
    across all salts), so no AQE skew handling is ever needed here.

    Salt -> partition placement is computed, not hashed or sampled
    (operators/routing.py): exact balance, no birthday packing, no range
    sampler re-executing the child plan.

    ``range_buckets``: sub-split each salt by doc_id range (quantile
    bounds, one tiny sample job) when a single salt's docs exceed one
    task's memory budget — partition count becomes n_salts*range_buckets
    and blocks of a (term, salt) group stay range-disjoint ACROSS buckets,
    which is exactly the invariant the block-max query scorer relies on.
    At the sandbox scales one bucket per salt suffices; at the 10^12-doc
    point this is the knob that bounds kernel memory instead of n_salts
    (which queries also key on).

    ``avgdl_col``: name of a per-row avgdl column (multi-field build —
    each packed row is one (doc, field) and carries ITS field's
    collection average); when given, the scalar ``avgdl`` is ignored and
    block-max norms are computed with the per-field value.
    """
    from .routing import exact_route_expr

    with_pos = "pos" in packed.columns
    spark = packed.sparkSession

    salted = packed.withColumn(
        "salt", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_salts)).cast("int")
    )
    route_key = F.col("salt")
    n_keys = n_salts
    if range_buckets > 1:
        qs = [i / range_buckets for i in range(1, range_buckets)]
        bounds = salted.stat.approxQuantile(key_col, qs, 0.001)
        bexpr = F.lit(0)
        for bound in bounds:
            bexpr = bexpr + F.when(F.col(key_col) > bound, 1).otherwise(0)
        route_key = F.col("salt") * range_buckets + bexpr
        n_keys = n_salts * range_buckets
    route = exact_route_expr(spark, route_key, n_keys, n_keys)
    arranged = salted.repartition(n_keys, route.alias("_salt_route"))

    def make_blocks_packed(batches) -> "pd.DataFrame":
        lst = list(batches)
        if not lst:
            return
        pdf = pd.concat(lst, ignore_index=True)
        if len(pdf) == 0:
            return
        # numpy explode: repeat each doc's (id, salt, len) once per term
        tlists = pdf["terms"].to_numpy()
        nterms = np.fromiter(
            (len(t) for t in tlists), dtype=np.int64, count=len(tlists)
        )
        nz = nterms > 0
        if not nz.any():
            return
        terms = np.concatenate(
            [np.asarray(t, dtype=object) for t, ok in zip(tlists, nz) if ok]
        )
        tfs = np.concatenate(
            [np.asarray(t) for t, ok in zip(pdf["tfs"].to_numpy(), nz) if ok]
        ).astype(np.float64)
        doc_ids = np.repeat(
            pdf[key_col].to_numpy()[nz], nterms[nz]
        ).astype(np.uint64)
        salts = np.repeat(pdf["salt"].to_numpy()[nz], nterms[nz])
        dls = np.repeat(
            pdf["doc_len"].to_numpy()[nz], nterms[nz]
        ).astype(np.float64)
        pos_arr = None
        if with_pos:
            pos_arr = np.concatenate(
                [np.asarray(p, dtype=object)
                 for p, ok in zip(pdf["pos"].to_numpy(), nz) if ok]
            )
        avg = avgdl
        if avgdl_col is not None:
            avg = np.repeat(
                pdf[avgdl_col].to_numpy()[nz], nterms[nz]
            ).astype(np.float64)
        yield pd.DataFrame(
            _blocks_from_arrays(
                terms, salts, doc_ids, tfs, dls, pos_arr,
                avg, block_size, k1, b,
            )
        )

    schema = SEGMENT_SCHEMA_POS if with_pos else SEGMENT_SCHEMA
    return arranged.mapInPandas(make_blocks_packed, schema=schema)


def decode_block_positions(
    pos_buf: bytes, tfs: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Decode one block's ``positions`` payload back to absolute 1-based
    token offsets.

    Returns ``(flat_positions, posting_starts)``: posting i's offsets are
    ``flat_positions[posting_starts[i] : posting_starts[i] + tfs[i]]``,
    ascending. One vectorized varbyte pass + a segmented cumsum — no
    per-posting loop."""
    from .varbyte import varbyte_decode

    gaps = varbyte_decode(pos_buf).astype(np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
    cs = np.cumsum(gaps)
    # subtract each posting's preceding cumulative sum so the cumsum
    # restarts at the posting boundary (the first gap is the absolute pos)
    offsets = cs[starts] - gaps[starts]
    flat = cs - np.repeat(offsets, tfs)
    return flat, starts


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


# Reserved posting-list term for the index-resident tombstone set
# (plans/generations.py commits it to the "del_segments" stage; the
# query kernels decode their salt's delete ids from it in-place). The
# NUL bytes make collision with real terms impossible: every analyzer
# chain emits NUL-free tokens and filter-posting terms are
# "<col>:<value>" over string-cast column values.
DEL_TERM = "\x00del\x00"


def decode_segment_doc_ids(segments: DataFrame) -> DataFrame:
    """Decode segment blocks back to ``(term, doc_id)`` posting rows —
    one Arrow batch pass, no per-row Python. Used by the tiered merge to
    rebuild FILTER postings minus physically-applied tombstones (the
    facet counters read filter postings directly, so stale rows would
    be counted; scored postings never need this — the merge re-segments
    them from the compact tf rows instead)."""
    from .varbyte import delta_decode

    def explode_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            terms, ids = [], []
            for row in pdf.itertuples(index=False):
                d = delta_decode(row.doc_gaps).astype(np.int64)
                terms.extend([row.term] * d.size)
                ids.append(d)
            if ids:
                yield pd.DataFrame({
                    "term": terms, "doc_id": np.concatenate(ids)})

    return segments.select("term", "doc_gaps").mapInPandas(
        explode_ids, schema="term string, doc_id long")
