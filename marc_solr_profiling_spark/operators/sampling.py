"""Dataset splitting, sampling, and shard packing for training pipelines.

The last mile of a training-data pipeline after cleaning/dedup: carve the
corpus into deterministic train/val/test splits, rebalance languages, and
pack documents into fixed-token-budget shards. No reference counterpart
(the reference profiles a finished index); semantics follow the standard
LLM-data recipes — hash-based splits (stable under re-runs and corpus
growth), temperature-based language rebalancing (the multilingual mixing
rule of mT5/CC100: q_l proportional to p_l^alpha), and contiguous
token-budget sharding.

Determinism rule used throughout: selection decisions key on the md5 hex
prefix of the document key. Both Spark and DuckDB emit identical lowercase
md5 hex, and lexicographic order of fixed-width lowercase hex equals
numeric order — so thresholds are plain string literals, reproducible in
any engine, and a document's fate never depends on partitioning, sampling
seeds, or row order.
"""

from __future__ import annotations

from typing import Dict, Iterator, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frac_to_hex8(frac: float) -> str:
    """A [0,1) fraction as the 8-hex-digit threshold it corresponds to on
    the md5-prefix line (2^32 buckets)."""
    return format(min(int(frac * 2**32), 2**32 - 1), "08x")


def _bucket(key_col: str, salt: str):
    """The 8-hex-char md5 prefix of (salt || key): a uniform draw in
    [0, 2^32) encoded so string order == numeric order."""
    return F.substring(
        F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 8)


def hash_split(docs: DataFrame, key_col: str = "doc_id",
               weights: Mapping[str, float] | None = None,
               salt: str = "split") -> DataFrame:
    """Deterministic, re-run-stable train/val/test assignment: the split a
    document lands in is a pure function of its key — growing the corpus
    never moves an existing document between splits (the property random
    splits lack and every data pipeline eventually needs for eval
    hygiene).

    Adds a ``split`` column; weights normalize to 1. Pure per-row
    expressions — no shuffle, no RNG state.
    """
    w = dict(weights or {"train": 0.9, "val": 0.05, "test": 0.05})
    total = sum(w.values())
    b = _bucket(key_col, salt)
    expr = None
    acc = 0.0
    items = list(w.items())
    for name, frac in items[:-1]:
        acc += frac / total
        cond = b < F.lit(frac_to_hex8(acc))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return docs.withColumn("split", expr)


def stratified_sample(docs: DataFrame, fractions: Mapping[str, float],
                      stratum_col: str = "lang", key_col: str = "doc_id",
                      default_frac: float = 0.0,
                      salt: str = "sample") -> DataFrame:
    """Deterministic per-stratum subsample: keep a document iff its hash
    bucket falls under its stratum's fraction. Same guarantees as
    :func:`hash_split` (re-run stable, partition-independent), unlike
    ``df.sampleBy`` whose selection depends on seed+partitioning. Zero
    shuffle."""
    b = _bucket(key_col, salt)
    thr = None
    for val, frac in sorted(fractions.items()):
        c = F.lit(frac_to_hex8(frac))
        thr = (F.when(F.col(stratum_col) == val, c)
               if thr is None else thr.when(F.col(stratum_col) == val, c))
    thr = (thr.otherwise(F.lit(frac_to_hex8(default_frac)))
           if thr is not None else F.lit(frac_to_hex8(default_frac)))
    return docs.filter(b < thr)


def temperature_rebalance_plan(docs: DataFrame, alpha: float = 0.3,
                               stratum_col: str = "lang",
                               round_to: int = 6) -> DataFrame:
    """The multilingual temperature-sampling plan (mT5 §3.1 / CC100):
    language l with corpus share p_l is sampled with probability
    proportional to p_l^alpha; alpha<1 up-weights tail languages. Returns
    one row per stratum: ``(stratum, n_docs, share, mix_weight,
    keep_prob)`` where ``mix_weight`` is the normalized q_l and
    ``keep_prob`` is the per-document acceptance probability that realizes
    the mix in one pass, scaled so the largest-upweight stratum keeps
    everything (q_l/p_l normalized by its max).

    One groupBy on the stratum; the quantities are pure column math on the
    tiny per-stratum rollup. Apply with :func:`stratified_sample` using
    the emitted ``keep_prob`` values.
    """
    by = docs.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count("*").alias("n_docs"))
    tot = by.agg(F.sum("n_docs").alias("total"))
    p = by.crossJoin(F.broadcast(tot)).withColumn(
        "share", F.col("n_docs") / F.col("total"))
    q = p.withColumn("q_raw", F.pow("share", F.lit(alpha)))
    qsum = q.agg(F.sum("q_raw").alias("q_sum"))
    r = q.crossJoin(F.broadcast(qsum)).withColumn(
        "mix_weight", F.col("q_raw") / F.col("q_sum")).withColumn(
        "ratio", F.col("mix_weight") / F.col("share"))
    rmax = r.agg(F.max("ratio").alias("ratio_max"))
    out = r.crossJoin(F.broadcast(rmax)).select(
        "stratum",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round("share", round_to).alias("share"),
        F.round("mix_weight", round_to).alias("mix_weight"),
        F.round(F.col("ratio") / F.col("ratio_max"), round_to)
        .alias("keep_prob"),
    )
    return out


def pack_shards(docs: DataFrame, tokens_per_shard: int,
                key_col: str = "doc_id", weight_col: str = "n_tokens",
                partitions: int | None = None) -> DataFrame:
    """Contiguous fixed-token-budget shard assignment: documents in key
    order are laid end to end on the token line and a document's shard is
    the budget-sized bin its START position falls in — shards hold
    ~``tokens_per_shard`` tokens (overflow bounded by one document, which
    is never split). This is the prefix-sum-expressible packing rule;
    greedy carry-over packing is inherently sequential and cannot
    parallelize. Returns ``(key, weight, shard_id)``.

    Scale shape — this is a GLOBAL prefix sum, and the naive Spark
    spelling (``sum().over(Window.orderBy(key))`` with no partition key)
    funnels the whole corpus through ONE task. Instead, the classic
    two-phase distributed scan:

      1. range-partition + sort by key, local cumulative sums per
         partition (one pass),
      2. collect the P per-partition totals (P scalars — driver-sized by
         construction), prefix-sum them on the driver,
      3. broadcast the offsets back as a literal map and add.

    One range shuffle total; every partition works independently in both
    passes. ``shard_id = floor(global_start / tokens_per_shard)``.
    """
    scanned, start = _global_starts(docs, key_col, weight_col, partitions,
                                    cache_key="pack_shards")
    return scanned.select(
        key_col, weight_col,
        F.floor(start / tokens_per_shard).cast("long").alias("shard_id"),
    )


def _global_starts(docs: DataFrame, key_col: str, weight_col: str,
                   partitions: int | None, cache_key: str):
    """The shared two-phase distributed prefix sum (see
    :func:`pack_shards` docstring): returns ``(scanned_frame,
    start_col)`` where ``start_col`` is each row's global token START
    position in key order. One range shuffle; per-partition totals are
    P driver-sized scalars."""
    import pandas as pd
    from pyspark import TaskContext

    spark = docs.sparkSession
    parts = partitions or spark.sparkContext.defaultParallelism
    d = (
        docs.select(F.col(key_col), F.col(weight_col).cast("long"))
        .repartitionByRange(parts, key_col)
        .sortWithinPartitions(key_col)
    )

    def local_scan(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        pid = TaskContext.get().partitionId()
        run = 0
        for pdf in batches:
            w = pdf[weight_col].to_numpy()
            cum = w.cumsum() + run
            run = int(cum[-1]) if len(cum) else run
            yield pd.DataFrame({
                key_col: pdf[key_col],
                weight_col: pdf[weight_col],
                "pid": pid,
                "local_end": cum,  # cumsum INCLUDING this row, within pid
            })

    scanned = d.mapInPandas(
        local_scan,
        schema=f"{key_col} long, {weight_col} long, pid int, local_end long",
    )
    # cache: pass 2 must see the same partition numbering as the totals
    from . import _cache

    _cache.begin(cache_key)
    scanned = _cache.hold(cache_key, scanned)
    totals = dict(
        scanned.groupBy("pid").agg(F.max("local_end").alias("t")).collect()
    )
    offsets: Dict[int, int] = {}
    acc = 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    omap = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    ) if offsets else F.create_map()
    start = (F.coalesce(omap[F.col("pid")], F.lit(0))
             + F.col("local_end") - F.col(weight_col))
    return scanned, start


def pack_sequences(docs: DataFrame, seq_len: int,
                   key_col: str = "doc_id", weight_col: str = "n_tokens",
                   partitions: int | None = None) -> DataFrame:
    """Fixed-length training-SEQUENCE packing: documents in key order
    are concatenated on the token line and CUT into back-to-back
    sequences of exactly ``seq_len`` tokens (the "pack to 2048-token
    context windows" step of LM training-data prep — unlike
    :func:`pack_shards`, a document that straddles a boundary IS split,
    and every sequence except the last is exactly full).

    Returns one row per (document, sequence) FRAGMENT:
    ``(key, weight, seq_id, tok_from, tok_to)`` with ``tok_from``/
    ``tok_to`` the half-open LOCAL token range of the document that
    lands in ``seq_id`` — exactly what a downstream tokenized-shard
    writer needs to slice each document's token array into its
    sequences. Zero-token docs contribute no fragment.

    Scale shape: the same two-phase global prefix sum as
    :func:`pack_shards` (one range shuffle), then the fragment explode
    is a per-row JVM ``sequence()`` over the spanned sequence ids —
    fragments per doc = ceil(weight / seq_len) + 1 at most, never a
    corpus-wide window or driver loop.
    """
    scanned, start_col = _global_starts(docs, key_col, weight_col,
                                        partitions,
                                        cache_key="pack_sequences")
    L = int(seq_len)
    base = scanned.filter(F.col(weight_col) > 0).select(
        key_col, weight_col, start_col.alias("_start"))
    first = (F.col("_start") / L).cast("long")
    last = ((F.col("_start") + F.col(weight_col) - 1) / L).cast("long")
    frag = base.select(
        key_col, weight_col, "_start",
        F.explode(F.sequence(first, last)).alias("seq_id"),
    )
    return frag.select(
        key_col, weight_col,
        "seq_id",
        F.greatest(F.col("seq_id") * L - F.col("_start"), F.lit(0))
        .cast("long").alias("tok_from"),
        F.least((F.col("seq_id") + 1) * L - F.col("_start"),
                F.col(weight_col).cast("long"))
        .cast("long").alias("tok_to"),
    )


def global_shuffle(docs: DataFrame, seed: str = "shuffle",
                   key_col: str = "doc_id",
                   partitions: int | None = None) -> DataFrame:
    """Deterministic corpus-wide training-order shuffle: every document
    gets a dense 0-based ``shuffle_rank`` in the total order
    ``(md5(seed:key), key)`` — the "shuffle the corpus before epoch
    writing" step of a training-data pipeline, made reproducible (same
    seed -> same order on every re-run, no RNG state) and auditable
    (the twin is one ``row_number() OVER (ORDER BY md5...)``).

    Scale shape: the naive dense rank is a no-partition-key window =
    one task holding the corpus. This is the same two-phase distributed
    scan as :func:`pack_shards`: range-partition + sort on the hash
    key, local 0-based ranks per partition, collect P per-partition
    COUNTS (driver-sized scalars), prefix-sum, broadcast offsets back.
    One range shuffle total. Downstream shard writers consume
    ``shuffle_rank`` directly (e.g. ``floor(rank / docs_per_shard)``),
    or feed the ranked frame to :func:`pack_shards` keyed on the rank
    for token-budget shards in shuffled order.

    Note the rank is POSITIONAL: growing the corpus perturbs ranks (any
    dense rank must). The hash KEY itself is growth-stable — stable
    properties (splits, sampling) belong on the key
    (:func:`hash_split`), the rank is for materializing one ordering.
    """
    import pandas as pd
    from pyspark import TaskContext

    spark = docs.sparkSession
    parts = partitions or spark.sparkContext.defaultParallelism
    key_t = docs.select(key_col).schema.fields[0].dataType.simpleString()
    d = (
        docs.select(
            F.col(key_col),
            F.md5(F.concat(F.lit(seed + ":"),
                           F.col(key_col).cast("string"))
                  ).alias("shuffle_key"),
        )
        .repartitionByRange(parts, "shuffle_key", key_col)
        .sortWithinPartitions("shuffle_key", key_col)
    )

    def local_rank(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        pid = TaskContext.get().partitionId()
        run = 0
        for pdf in batches:
            n = len(pdf)
            yield pd.DataFrame({
                key_col: pdf[key_col],
                "shuffle_key": pdf["shuffle_key"],
                "pid": pid,
                "local_rank": range(run, run + n),
            })
            run += n

    ranked = d.mapInPandas(
        local_rank,
        schema=(f"{key_col} {key_t}, shuffle_key string, pid int, "
                "local_rank long"),
    )
    from . import _cache

    _cache.begin("global_shuffle")
    ranked = _cache.hold("global_shuffle", ranked)
    counts = dict(
        ranked.groupBy("pid").agg(F.count("*").alias("c")).collect()
    )
    offsets: Dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    omap = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    ) if offsets else F.create_map()
    return ranked.select(
        key_col, "shuffle_key",
        (F.coalesce(omap[F.col("pid")], F.lit(0))
         + F.col("local_rank")).cast("long").alias("shuffle_rank"),
    )


def temperature_rebalance_weighted(docs: DataFrame, alpha: float = 0.3,
                                   stratum_col: str = "lang",
                                   weight_col: str | None = None,
                                   round_to: int = 6) -> DataFrame:
    """:func:`temperature_rebalance_plan` with shares denominated in a
    WEIGHT column instead of document counts — the form the mT5/CC100
    recipes actually use (p_l = token share of language l, not doc
    share). ``weight_col=None`` falls back to doc counting. Same output
    schema; ``n_docs`` still reports the stratum's document count and
    the plan quantities (share, mix_weight, keep_prob) use the weight."""
    if weight_col is None:
        return temperature_rebalance_plan(
            docs, alpha=alpha, stratum_col=stratum_col, round_to=round_to)
    by = docs.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count("*").alias("n_docs"),
        F.sum(weight_col).cast("double").alias("w"))
    tot = by.agg(F.sum("w").alias("total"))
    p = by.crossJoin(F.broadcast(tot)).withColumn(
        "share", F.col("w") / F.col("total"))
    q = p.withColumn("q_raw", F.pow("share", F.lit(alpha)))
    qsum = q.agg(F.sum("q_raw").alias("q_sum"))
    r = q.crossJoin(F.broadcast(qsum)).withColumn(
        "mix_weight", F.col("q_raw") / F.col("q_sum")).withColumn(
        "ratio", F.col("mix_weight") / F.col("share"))
    rmax = r.agg(F.max("ratio").alias("ratio_max"))
    return r.crossJoin(F.broadcast(rmax)).select(
        "stratum",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round("share", round_to).alias("share"),
        F.round("mix_weight", round_to).alias("mix_weight"),
        F.round(F.col("ratio") / F.col("ratio_max"), round_to)
        .alias("keep_prob"),
    )


def pack_shards_bpe(docs: DataFrame, tokens_per_shard: int,
                    tokenizer=None, key_col: str = "doc_id",
                    text_col: str = "text",
                    partitions: int | None = None) -> DataFrame:
    """:func:`pack_shards` with the budget denominated in LEARNED BPE
    tokens (``functions/bpe.py`` — train with ``tokenizer_from_corpus``
    or load GPT-2-format files): the shard sizes a trainer sees are the
    model's actual token counts, not a whitespace proxy. The count runs
    as one Arrow kernel over the text (zero shuffle) before the
    two-phase prefix-sum packing. ``tokenizer=None`` keeps the
    whitespace-piece proxy fallback (``functions/textstats.token_count``)
    so callers can defer training. Returns
    ``(key, bpe_tokens, shard_id)``."""
    if tokenizer is None:
        from ..functions.textstats import token_count

        weighted = docs.select(
            key_col, token_count(text_col).alias("bpe_tokens"))
    else:
        from ..functions.bpe import with_bpe_token_count

        weighted = with_bpe_token_count(
            docs.select(key_col, text_col), tokenizer,
            text_col=text_col).select(key_col, "bpe_tokens")
    return pack_shards(weighted, tokens_per_shard, key_col=key_col,
                       weight_col="bpe_tokens", partitions=partitions)


def temperature_plan_bpe(docs: DataFrame, alpha: float = 0.3,
                         stratum_col: str = "lang", tokenizer=None,
                         text_col: str = "text",
                         round_to: int = 6) -> DataFrame:
    """:func:`temperature_rebalance_weighted` with BPE-token weights
    from a trained tokenizer (mT5 §3.1's p_l IS a token share);
    ``tokenizer=None`` falls back to doc-count shares."""
    if tokenizer is None:
        return temperature_rebalance_plan(
            docs, alpha=alpha, stratum_col=stratum_col, round_to=round_to)
    from ..functions.bpe import with_bpe_token_count

    weighted = with_bpe_token_count(docs, tokenizer, text_col=text_col)
    return temperature_rebalance_weighted(
        weighted, alpha=alpha, stratum_col=stratum_col,
        weight_col="bpe_tokens", round_to=round_to)
