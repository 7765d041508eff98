"""Deduplication operators for a large-scale training-data pipeline:
exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design for 100 TB:
- exact dedup: hash-groupBy on a digest column (never on the raw text —
  shuffle rows carry a 32-byte key, not the document).
- MinHash/LSH: per-row signature (shuffle-free) -> band buckets -> join
  within buckets only. Candidate verification (exact Jaccard) runs on the
  candidate pairs, which LSH keeps ≪ n².
- hot-bucket guard: buckets above a size cap are dropped with a logged
  count (boilerplate pages collapse into mega-buckets at web scale; pairing
  inside them is O(cap²) per bucket otherwise).

Portability: hashes are md5-based (identical bytes in Spark and DuckDB), so
every stage up to banding is oracle-checkable; pair generation is checked
against an equivalent SQL self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import tokens_simple


def exact_dup_groups(docs: DataFrame, key_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents: (text_md5, n_dups, min_key).
    Only groups with >1 member. Shuffle key is the 32-char digest."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_md5"), F.col(key_col))
        .groupBy("text_md5")
        .agg(F.count("*").alias("n_dups"), F.min(key_col).alias("min_key"))
        .filter(F.col("n_dups") > 1)
    )


def shingles_expr(text_col: str, n: int = 3):
    """Distinct n-gram token shingles of the simple-chain token stream,
    as 'tok1 tok2 tok3' strings. Pure JVM.

    Built as a ``zip_with`` chain over n shifted ``slice`` views of the
    token array — NOT ``transform(sequence, i -> element_at(toks, i+j))``:
    Spark evaluates a lambda's child expressions per ELEMENT, so with the
    tokenizer inside the lambda the regexp ran once per shingle per term
    (O(tokens^2) per doc — measured 12x slower at sf0.1). Each ``slice``
    argument here is a row-level input evaluated once per row."""
    toks = tokens_simple(text_col)
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    grams = F.slice(toks, 1, m)
    for j in range(1, n):
        grams = F.zip_with(grams, F.slice(toks, j + 1, m),
                           lambda a, b: F.concat_ws(" ", a, b))
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(
            # short docs: single shingle = whole token stream (non-empty only)
            F.when(F.size(toks) > 0,
                   F.array(F.array_join(toks, " "))).otherwise(F.array())
        )
    )


def minhash_signature_expr(shingle_col, n_hashes: int = 16):
    """MinHash signature as array<string>: for hash i, min over shingles of
    md5(i || ':' || shingle). String-min over md5 hex IS a valid min-hash
    (uniform over a totally ordered space) and is bit-identical in DuckDB.
    Empty shingle sets -> nulls (excluded from banding).

    NOTE: evaluates ``shingle_col`` n_hashes times — fine for one-off
    expressions over small projections; for corpus-scale signatures use
    :func:`minhash_signatures` (explode + one grouped pass)."""
    return F.array(
        *[
            F.array_min(
                F.transform(
                    shingle_col,
                    lambda s: F.md5(F.concat(F.lit(f"{i}:"), s)),
                )
            )
            for i in range(n_hashes)
        ]
    )


def minhash_signatures(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    shingle_n: int = 3,
    hash_impl: str = "md5",
) -> DataFrame:
    """(key, h0..h{n-1}) signatures with ZERO shuffle: materialize the
    distinct-shingle array once per row, then each signature slot is an
    ``array_min(transform(...))`` over that BOUND column — all of a
    document's shingles already live in its row, so a min over them never
    needed the explode + corpus-wide groupBy this used previously. Docs
    with zero shingles (empty text) are absent — matching the SQL twin's
    GROUP BY semantics.

    ``hash_impl``: ``"md5"`` (default) emits hex-string minima that DuckDB
    reproduces bit-for-bit — the oracle contract. ``"fast64"`` emits int64
    minima from a fully NUMERIC kernel: per-doc gram hashes from
    :func:`_doc_gram_hashes_kernel` (no gram strings built at all), then
    one batch-flat splitmix64 remix + ``np.minimum.reduceat`` per slot —
    an equally valid min-hash family. Measured at 3.2M docs/local[32]:
    150 s (md5) vs 108 s (fast64); BOTH sit near the corpus tokenization
    floor (~84 s of JVM regexp at this scale), which is why the gap is
    1.4x and not more — signatures are effectively free once the corpus
    is tokenized. Banding/candidate semantics are identical either way;
    use md5 only when cross-engine replay matters.
    """
    if hash_impl == "md5":
        sh = docs.select(
            F.col(key_col), shingles_expr(text_col, shingle_n).alias("sh")
        ).filter(F.size("sh") > 0)
        return sh.select(
            key_col,
            *[
                F.array_min(
                    F.transform(
                        F.col("sh"),
                        # F.transform calls the lambda eagerly, so closing
                        # over the loop variable is safe; a second arg
                        # would make Spark bind the ELEMENT INDEX to it
                        lambda s: F.md5(F.concat(F.lit(f"{i}:"), s)),
                    )
                ).alias(f"h{i}")
                for i in range(n_hashes)
            ],
        )
    if hash_impl != "fast64":
        raise ValueError(f"unknown hash_impl {hash_impl!r}")

    import numpy as np
    import pandas as pd

    per_doc = _doc_gram_hashes_kernel(docs, shingle_n, text_col,
                                      key_col=key_col)
    key_t = docs.select(key_col).schema.fields[0].dataType.simpleString()
    C1 = np.uint64(0xBF58476D1CE4E5B9)
    C2 = np.uint64(0x94D049BB133111EB)

    def mins_kernel(batches):
        MASK = 0xFFFFFFFFFFFFFFFF
        for pdf in batches:
            lens = np.fromiter((len(h) for h in pdf["hs"]), dtype=np.int64,
                               count=len(pdf))
            flat = (np.concatenate([np.asarray(h, dtype=np.int64)
                                    for h in pdf["hs"]]).view(np.uint64)
                    if len(pdf) else np.empty(0, dtype=np.uint64))
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            cols = {key_col: pdf[key_col]}
            # one flat remix + segmented minima per slot — the per-doc
            # loop disappears into reduceat
            for i in range(n_hashes):
                x = flat ^ np.uint64((0x9E3779B97F4A7C15 * (i + 1)) & MASK)
                x = (x ^ (x >> np.uint64(30))) * C1
                x = (x ^ (x >> np.uint64(27))) * C2
                x ^= x >> np.uint64(31)
                cols[f"h{i}"] = (
                    np.minimum.reduceat(x, starts).view(np.int64)
                    if len(x) else np.empty(0, dtype=np.int64))
            yield pd.DataFrame(cols)

    hcols = ", ".join(f"h{i} long" for i in range(n_hashes))
    return per_doc.mapInPandas(
        mins_kernel, schema=f"{key_col} {key_t}, {hcols}")


def minhash_lsh_candidates(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: int = 200,
    hash_impl: str = "md5",
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash LSH.

    rows = bands of n_hashes/bands each; docs sharing any full band land in
    one bucket; pairs are generated within buckets with a bucket-size cap
    (skew guard). Output: (key_a, key_b) with key_a < key_b, distinct.
    """
    rows_per_band = n_hashes // bands
    # single shingle pass (explode + grouped mins) — docs with zero shingles
    # are naturally absent, matching the SQL twin's GROUP BY semantics
    sig = minhash_signatures(
        docs, key_col=key_col, text_col=text_col,
        n_hashes=n_hashes, shingle_n=shingle_n, hash_impl=hash_impl,
    )

    band_rows = sig.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "|", *[F.col(f"h{b * rows_per_band + r}")
                                   for r in range(rows_per_band)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(key_col, F.col("bb.band"), F.col("bb.bucket"))

    # skew guard: drop mega-buckets (boilerplate collapse). Window count
    # (no orderBy -> whole-frame count, no sort) instead of groupBy+join:
    # one shuffle on (band, bucket), no duplicate execution of the
    # signature subtree, and the self-join below reuses the exchange.
    from pyspark.sql import Window

    w = Window.partitionBy("band", "bucket")
    bounded = (
        band_rows.withColumn("bsize", F.count("*").over(w))
        .filter(F.col("bsize") <= max_bucket)
        .drop("bsize")
    )

    a = bounded.select(F.col("band"), F.col("bucket"), F.col(key_col).alias("key_a"))
    b = bounded.select(F.col("band"), F.col("bucket"), F.col(key_col).alias("key_b"))
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs >= threshold.

    Inverted-index join on shingles: |A∩B| = co-occurring shingle count,
    |A∪B| = |A|+|B|-|A∩B|. Shingles occurring in > max_shingle_df docs are
    dropped before pairing (stopword-shingle skew guard; exactness for
    high-sim pairs is preserved in practice since near-dups share rare
    shingles too — documented approximation).
    Output: (key_a, key_b, jaccard) rounded to 6 decimals.
    """
    from . import _cache

    _cache.begin("ngram_jaccard")
    sh = _cache.hold("ngram_jaccard", docs.select(
        F.col(key_col), F.explode(shingles_expr(text_col, shingle_n)).alias("shingle")
    ))  # scanned 3x (sizes, df, pairing); shingling runs once; released
    # on the NEXT call (the returned plan is lazy)
    sizes = sh.groupBy(key_col).agg(F.count("*").alias("n_shingles"))
    shingle_df = sh.groupBy("shingle").agg(F.count("*").alias("sdf"))
    rare = sh.join(shingle_df.filter(F.col("sdf") <= max_shingle_df), "shingle")

    a = rare.select(F.col("shingle"), F.col(key_col).alias("key_a"))
    b = rare.select(F.col("shingle"), F.col(key_col).alias("key_b"))
    inter = (
        a.join(b, "shingle")
        .filter(F.col("key_a") < F.col("key_b"))
        .groupBy("key_a", "key_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col(key_col).alias("key_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col(key_col).alias("key_b"), F.col("n_shingles").alias("nb"))
    return (
        inter.join(sa, "key_a")
        .join(sb, "key_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("na") + F.col("nb") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("key_a", "key_b", "jaccard")
    )


def lsh_jaccard_pairs(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: int = 200,
    threshold: float = 0.2,
) -> DataFrame:
    """Banded MinHash-LSH candidates -> EXACT Jaccard verification, on
    candidates only — the production near-dup pipeline shape.

    This is the composition :func:`ngram_jaccard_pairs`'s docstring
    promises at 100 TB: instead of the full-corpus inverted-index self-join
    (whose shingle-df cap still admits ~cap^2/2 pairs per hot shingle),
    candidate pairs come from the banded LSH bucket join, and the exact
    |A∩B| co-occurrence count runs over the shingle streams of CANDIDATE
    DOCS ONLY (a semi-join prunes the explode before the self-join).
    Output: (key_a, key_b, jaccard) with jaccard >= threshold.
    """
    from . import _cache

    _cache.begin("lsh_jaccard")
    cand = _cache.hold("lsh_jaccard", minhash_lsh_candidates(
        docs, key_col=key_col, text_col=text_col, n_hashes=n_hashes,
        bands=bands, shingle_n=shingle_n, max_bucket=max_bucket,
    ))

    sh = docs.select(
        F.col(key_col),
        F.explode(shingles_expr(text_col, shingle_n)).alias("shingle"),
    )
    cand_docs = (
        cand.select(F.col("key_a").alias(key_col))
        .union(cand.select(F.col("key_b").alias(key_col)))
        .distinct()
    )
    # candidate docs are a small fraction of the corpus: restrict the
    # shingle stream before the self-join (left_semi keeps the plan an
    # existence probe; the per-doc distinct shingle sets stay intact, so
    # sizes computed from sh_c are exact for candidate docs)
    sh_c = _cache.hold("lsh_jaccard", sh.join(cand_docs, key_col, "left_semi"))
    sizes = sh_c.groupBy(key_col).agg(F.count("*").alias("n_shingles"))

    a = sh_c.select(F.col("shingle"), F.col(key_col).alias("key_a"))
    b = sh_c.select(F.col("shingle"), F.col(key_col).alias("key_b"))
    inter = (
        a.join(b, "shingle")
        .filter(F.col("key_a") < F.col("key_b"))
        .groupBy("key_a", "key_b")
        .agg(F.count("*").alias("n_common"))
        .join(cand, ["key_a", "key_b"], "left_semi")
    )
    sa = sizes.select(F.col(key_col).alias("key_a"),
                      F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col(key_col).alias("key_b"),
                      F.col("n_shingles").alias("nb"))
    out = (
        inter.join(sa, "key_a")
        .join(sb, "key_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("na") + F.col("nb") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("key_a", "key_b", "jaccard")
    )
    return out


def simhash_expr(text_col: str, bits: int = 16):
    """SimHash over simple tokens using md5-derived bit planes.

    For bit i, a token votes +1 if hex digit i of md5(token) >= '8'
    (top bit of that nibble), else -1; the simhash bit is 1 iff the vote sum
    is positive. bits <= 32 (md5 hex length). Bit-identical in DuckDB
    (same md5, same substr/threshold logic) — oracle-checkable.
    Returns an int column (bit i = 2^i).
    """
    return _simhash_from_md5s(
        F.transform(tokens_simple(text_col), lambda t: F.md5(t)), bits
    )


def _simhash_from_md5s(md5s, bits: int):
    """Per-bit majority votes over a (pre-computed) token-md5 array column.
    Callers that evaluate many bits should materialize the md5 array in its
    OWN projection first (see simhash_buckets): a multiply-referenced named
    column survives CollapseProject, so the per-token hashing runs once
    instead of once per bit."""
    bit_cols = []
    for i in range(bits):
        votes = F.aggregate(
            md5s,
            F.lit(0),
            lambda acc, h: acc
            + F.when(
                F.substring(h, i + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"),
                F.lit(1),
            ).otherwise(F.lit(-1)),
        )
        bit_cols.append(F.when(votes > 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bit_cols[0]
    for c in bit_cols[1:]:
        out = out + c
    return out.cast("long")


def simhash_buckets(docs: DataFrame, key_col: str = "doc_id",
                    text_col: str = "text", bits: int = 16) -> DataFrame:
    """(key, simhash) — Hamming-near docs collide on equal simhash for
    small corpora; at scale, candidate search splits the hash into bands
    (:func:`simhash_band_candidates`)."""
    md5s = docs.select(
        F.col(key_col),
        F.transform(tokens_simple(text_col), lambda t: F.md5(t)).alias("_md5s"),
    )
    return md5s.select(
        F.col(key_col), _simhash_from_md5s(F.col("_md5s"), bits).alias("simhash")
    )


def simhash_band_candidates(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 16,
    bands: int = 4,
    max_hamming: int | None = 3,
    max_bucket: int = 200,
) -> DataFrame:
    """Hamming-near pairs via banded SimHash — the search structure the
    simhash operator's docstring points at.

    Pigeonhole guarantee: two hashes within Hamming distance < ``bands``
    agree EXACTLY on at least one of the ``bands`` bit-bands, so banding
    finds every such pair (no recall loss up to bands-1 bit flips);
    candidates then pass an exact popcount(xor) <= ``max_hamming`` check —
    both pure integer expressions, JVM-side, oracle-replicable.

    Scale shape identical to minhash_lsh_candidates: per-row band keys, an
    equi-join on (band, band_bits) — never all-pairs — and a mega-bucket
    cap for degenerate bands (e.g. all-zero bands of empty-ish docs).
    Output: (key_a, key_b, hamming) with key_a < key_b, distinct.
    """
    rows_per_band = bits // bands
    mask = (1 << rows_per_band) - 1
    sh = simhash_buckets(docs, key_col=key_col, text_col=text_col, bits=bits)
    band_rows = sh.select(
        key_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * rows_per_band)
                        .bitwiseAND(F.lit(mask))
                        .alias("bval"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(key_col, "simhash", F.col("bb.band"), F.col("bb.bval"))

    from pyspark.sql import Window

    w = Window.partitionBy("band", "bval")
    bounded = (
        band_rows.withColumn("bsize", F.count("*").over(w))
        .filter(F.col("bsize") <= max_bucket)
        .drop("bsize")
    )
    a = bounded.select(
        "band", "bval",
        F.col(key_col).alias("key_a"), F.col("simhash").alias("_ha"),
    )
    b = bounded.select(
        "band", "bval",
        F.col(key_col).alias("key_b"), F.col("simhash").alias("_hb"),
    )
    pairs = (
        a.join(b, ["band", "bval"])
        .filter(F.col("key_a") < F.col("key_b"))
        .select(
            "key_a", "key_b",
            F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))).alias("hamming"),
        )
        .distinct()
    )
    if max_hamming is not None:
        pairs = pairs.filter(F.col("hamming") <= max_hamming)
    return pairs


def connected_components(
    pairs: DataFrame,
    left: str = "key_a",
    right: str = "key_b",
    key_out: str = "doc_id",
    label_out: str = "cluster_id",
    max_iters: int = 25,
) -> DataFrame:
    """Connected components over an undirected pair list -> one row per
    node ``(key_out, label_out)`` where the label is the component's
    MINIMUM node id — the duplicate-CLUSTER step a training-data
    pipeline runs after pairwise near-dup verification (keep
    ``doc_id == cluster_id`` as the canonical representative, drop the
    rest).

    Algorithm: iterative min-label propagation. Each round is one
    edge-list join + a groupBy-min (O(|E|) shuffle, fully partitioned —
    no driver-side graph), labels persist between rounds, and the loop
    exits when a round changes nothing. Rounds needed = eccentricity of
    the min node, which for near-dup clusters (near-cliques produced by
    banded LSH + verification) is 1-3; ``max_iters`` guards the
    pathological chain-graph case, where the label-doubling large-star/
    small-star variant would be the upgrade path.
    """
    from . import _cache

    edges = pairs.select(
        F.col(left).alias("src"), F.col(right).alias("dst")
    ).union(pairs.select(
        F.col(right).alias("src"), F.col(left).alias("dst")
    ))
    _cache.begin("components")
    edges = _cache.hold("components", edges)
    # localCheckpoint per round, not persist: an iterative DataFrame
    # algorithm's logical plan doubles every round, and Catalyst
    # re-analysis of the deepening tree quickly dominates the (cheap)
    # per-round jobs. Checkpointing truncates the plan to the
    # materialized partitions. local = executor-storage checkpoint (no
    # HDFS round trip); for multi-hour production runs on preemptible
    # executors, swap for reliable checkpoint(dir) every few rounds.
    labels = edges.select(
        F.col("src").alias("node")
    ).distinct().withColumn(
        "label", F.col("node")).localCheckpoint(eager=True)

    for _ in range(max_iters):
        nbr_min = (
            edges.join(labels, edges["src"] == labels["node"])
            .groupBy("dst").agg(F.min("label").alias("nbr"))
        )
        merged = labels.join(
            nbr_min, labels["node"] == nbr_min["dst"], "left"
        ).select(
            labels["node"], labels["label"],
            # Spark's least() skips NULLs, so isolated rounds keep label
            F.least(labels["label"], F.col("nbr")).alias("new_label"),
        ).localCheckpoint(eager=True)
        n_changed = merged.filter(
            F.col("new_label") < F.col("label")).count()
        labels = merged.select(
            "node", F.col("new_label").alias("label"))
        if n_changed == 0:
            break

    return labels.select(
        F.col("node").alias(key_out), F.col("label").alias(label_out)
    )


def ngram_removal_stats(docs: DataFrame, key_col: str = "doc_id",
                        text_col: str = "text", n: int = 8,
                        min_docs: int = 2) -> DataFrame:
    """Exact-substring (repeated n-gram) deduplication — the
    train-data-dedup of Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better"): any ``n``-token gram appearing in
    ``min_docs`` or more DISTINCT documents marks its token span for
    removal; returns per affected doc

        (key, n_tokens, n_removed, removed_frac)

    where ``n_removed`` counts tokens covered by at least one duplicated
    gram (overlapping spans union'd, not double-counted).

    Scale shape (the standard 3-shuffle sweep):
    1. one generator pass emits (doc, start, xxhash64(gram)) — the gram
       TEXT never enters a shuffle, only its 64-bit hash;
    2. shuffle 1: distinct-doc counts per gram hash (partial-agg'd);
       grams below ``min_docs`` — the overwhelming majority — drop here;
    3. shuffle 2: semi-join of gram instances against the surviving
       (rare) duplicated-gram set, on the 64-bit key;
    4. shuffle 3: per-(doc, position) distinct to union overlapping
       spans, then a per-doc count.
    Hot grams (boilerplate) fan out at step 3 exactly proportionally to
    their duplication — no crossJoin anywhere.
    """
    toks = docs.select(
        F.col(key_col), tokens_simple(text_col).alias("tk")
    ).withColumn("n_tokens", F.size("tk"))
    sz = F.col("n_tokens")
    inst = toks.select(
        key_col,
        "n_tokens",
        F.explode(
            F.when(
                sz >= n,
                F.transform(
                    F.sequence(F.lit(1), sz - (n - 1)),
                    lambda i: F.struct(
                        i.alias("start"),
                        F.xxhash64(
                            F.array_join(F.slice(F.col("tk"), i, F.lit(n)),
                                         " ")
                        ).alias("gh"),
                    ),
                ),
            ).otherwise(
                F.array().cast("array<struct<start:int,gh:bigint>>")
            )
        ).alias("g"),
    ).select(key_col, "n_tokens", "g.start", "g.gh")
    dup_grams = (
        inst.groupBy("gh")
        .agg(F.count_distinct(key_col).alias("ndocs"))
        .filter(F.col("ndocs") >= min_docs)
        .select("gh")
    )
    covered = (
        inst.join(dup_grams, "gh")
        .select(
            key_col,
            "n_tokens",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + (n - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    return (
        covered.groupBy(key_col, "n_tokens")
        .agg(F.count("*").alias("n_removed"))
        .select(
            key_col,
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_removed").cast("long").alias("n_removed"),
            F.round(F.col("n_removed") / F.col("n_tokens"), 6)
            .alias("removed_frac"),
        )
    )


def _doc_gram_hashes_kernel(df: DataFrame, n: int, text_col: str,
                            key_col: str | None):
    """Arrow kernel producing each document's DISTINCT n-gram hash array
    (one row per doc) — no gram strings are ever built: tokens (from the
    shared JVM tokenizer expression) map to 64-bit md5-prefix codes via a
    per-batch memo, and an n-gram is the wrapping int64 polynomial over its n codes
    (same fallback as shingles_expr: a doc shorter than n hashes its whole
    token stream). Hash equality == gram-string equality up to the usual
    negligible 64-bit collision trade."""
    import hashlib

    import numpy as np
    import pandas as pd

    cols = [F.col(key_col)] if key_col else []
    base = df.select(
        *cols, tokens_simple(text_col).alias("tk")
    ).filter(F.size("tk") > 0)
    P = np.int64(1099511628211)

    def kernel(batches):
        memo: dict = {}

        def code(t: str) -> int:
            # 64-bit md5 prefix, not crc32: at web-scale vocabularies a
            # 32-bit token collision is likely (birthday at ~80k tokens)
            # and would silently merge gram identities
            c = memo.get(t)
            if c is None:
                c = int.from_bytes(
                    hashlib.md5(t.encode("utf-8")).digest()[:8],
                    "big", signed=True)
                memo[t] = c
            return c

        for pdf in batches:
            out = []
            for i in range(len(pdf)):
                tk = pdf["tk"].iloc[i]
                c = np.fromiter((code(t) for t in tk), dtype=np.int64,
                                count=len(tk))
                m = len(c) - n + 1
                if m <= 0:
                    g = c[:1].copy()
                    for j in range(1, len(c)):
                        g = g * P + c[j:j + 1]
                else:
                    g = c[:m].copy()
                    for j in range(1, n):
                        g = g * P + c[j:j + m]
                hs = np.unique(g)
                key = [pdf[key_col].iloc[i]] if key_col else []
                out.append((*key, hs))
            kc = [key_col] if key_col else []
            yield pd.DataFrame(out, columns=kc + ["hs"])

    key_t = (df.select(key_col).schema.fields[0].dataType.simpleString()
             if key_col else None)
    schema = (f"{key_col} {key_t}, hs array<long>" if key_col
              else "hs array<long>")
    return base.mapInPandas(kernel, schema=schema)


def benchmark_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    key_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Eval-set n-gram decontamination (the GPT-3 appendix-C / PaLM
    train-test-overlap step): flag every training document that shares ANY
    token n-gram with a benchmark/eval corpus, with per-doc overlap counts
    so callers can choose flag-vs-drop thresholds.

    Scale shape — the asymmetry is the whole design: the benchmark side is
    an eval set (thousands of docs, fixed), so its distinct gram-hash set
    is DRIVER-SIZED by definition; it is collected once, sorted, and
    broadcast to the corpus kernel, which probes each document's distinct
    gram hashes with one ``searchsorted`` — fully map-side, zero shuffle,
    zero join, one output row per document. Grams are int64 polynomial
    hashes over per-token 64-bit codes (no gram strings built on either
    side; a rare collision flags one extra n-gram — the standard accepted
    trade, identical in kind to hashing the gram string). Measured at
    3.2M docs / local[32]: the JVM gram-string explode + broadcast-join
    form took 372 s; this kernel replaces both the string construction
    and the ~1.4B-row explode.

    Returns ``<key>, n_grams (distinct), n_hit, contaminated``; docs with
    zero shingles (empty text) are absent, like the other dedup operators.
    """
    import numpy as np
    import pandas as pd

    bench_rows = _doc_gram_hashes_kernel(
        benchmark, n, bench_text_col, key_col=None
    ).select(F.explode("hs").alias("h")).distinct().collect()
    bench_set = np.sort(np.array([r.h for r in bench_rows], dtype=np.int64))
    bc = docs.sparkSession.sparkContext.broadcast(bench_set)

    per_doc = _doc_gram_hashes_kernel(docs, n, text_col, key_col=key_col)

    def probe(batches):
        bs = bc.value
        for pdf in batches:
            ng, nh = [], []
            for hs in pdf["hs"]:
                hs = np.asarray(hs, dtype=np.int64)
                if len(bs) and len(hs):
                    pos = np.searchsorted(bs, hs)
                    pos[pos >= len(bs)] = len(bs) - 1
                    hit = int((bs[pos] == hs).sum())
                else:
                    hit = 0
                ng.append(len(hs))
                nh.append(hit)
            yield pd.DataFrame({
                key_col: pdf[key_col],
                "n_grams": ng,
                "n_hit": nh,
                "contaminated": [x > 0 for x in nh],
            })

    key_t = docs.select(key_col).schema.fields[0].dataType.simpleString()
    return per_doc.mapInPandas(
        probe,
        schema=(f"{key_col} {key_t}, n_grams long, n_hit long, "
                "contaminated boolean"),
    )


def fuzzy_dedup_keep(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: int = 200,
    threshold: float = 0.2,
) -> DataFrame:
    """The END-TO-END fuzzy-dedup stage (the FineWeb / RefinedWeb
    "MinHash dedup" step as one call): MinHash signatures -> banded LSH
    candidates -> exact-Jaccard verification -> connected components ->
    keep ONE representative per duplicate cluster. Returns
    ``(key, cluster_id, kept)`` for EVERY input document — singletons
    are their own cluster and are kept; within a cluster only the
    minimum key survives (the deterministic representative rule the
    cluster step documents).

    This is pure composition of the verified pieces
    (:func:`lsh_jaccard_pairs` + :func:`connected_components`), so the
    scale shape is theirs: banded bucket joins (never all-pairs),
    verification on candidates only, one O(|E|) join+agg per component
    round, and the final keep flag is a key-only left join against the
    component labels — document text never shuffles after the shingle
    stage.
    """
    pairs = lsh_jaccard_pairs(
        docs, key_col=key_col, text_col=text_col, n_hashes=n_hashes,
        bands=bands, shingle_n=shingle_n, max_bucket=max_bucket,
        threshold=threshold,
    )
    comp = connected_components(
        pairs, key_out=key_col, label_out="cluster_id")
    out = docs.select(key_col).join(comp, key_col, "left")
    cluster = F.coalesce(F.col("cluster_id"), F.col(key_col))
    return out.select(
        F.col(key_col),
        cluster.alias("cluster_id"),
        (cluster == F.col(key_col)).alias("kept"),
    )


def minhash_band_table(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    hash_impl: str = "md5",
) -> DataFrame:
    """The persistable LSH SIGNATURE INDEX of a corpus snapshot:
    ``(key, band, bucket)`` rows, ``bands`` per document. This is what a
    production pipeline stores next to the corpus so the NEXT crawl can
    be deduplicated against it without ever touching the old text again
    (:func:`dedup_against`). Pure composition of the zero-shuffle
    signature pass + one explode."""
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(
        docs, key_col=key_col, text_col=text_col,
        n_hashes=n_hashes, shingle_n=shingle_n, hash_impl=hash_impl,
    )
    return sig.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "|", *[F.col(f"h{b * rows_per_band + r}")
                                   for r in range(rows_per_band)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(key_col, F.col("bb.band"), F.col("bb.bucket"))


def dedup_against(
    new_docs: DataFrame,
    old_docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: int = 200,
    threshold: float = 0.2,
    old_bands: DataFrame | None = None,
) -> DataFrame:
    """Incremental cross-snapshot fuzzy dedup: flag each NEW document
    that near-duplicates any document of an EXISTING corpus — the
    "dedup the new crawl against the old corpus" stage every growing
    pipeline runs (RefinedWeb/FineWeb dedupe each CC snapshot against
    what's already kept).

    Asymmetric by design, which is the whole 100 TB story: the old
    corpus participates ONLY through (a) its banded signature index
    (``old_bands`` — precomputed via :func:`minhash_band_table` and
    stored; recomputed here when not supplied) and (b) the shingle
    streams of CANDIDATE old docs only (a key semi-join prunes the old
    text scan before any explode reaches a join). The old corpus is
    never self-joined, never re-shuffled wholesale, and with a stored
    band table its text is read only for rows that collide with the
    increment.

    Steps: new band table -> equi-join against the old band table on
    (band, bucket) (mega-buckets capped on the OLD side — boilerplate
    buckets grow with the archive, not the increment) -> exact-Jaccard
    verify on candidate pairs only -> per-new-doc aggregate. Returns
    one row per NEW document: ``(key, n_dups, dup_of, kept)`` with
    ``dup_of`` the smallest matching old key (NULL when none) and
    ``kept = (n_dups == 0)``. New docs with empty text have no
    signature, hence no candidates: kept.
    """
    from pyspark.sql import Window

    nb = minhash_band_table(
        new_docs, key_col=key_col, text_col=text_col,
        n_hashes=n_hashes, bands=bands, shingle_n=shingle_n)
    ob = old_bands if old_bands is not None else minhash_band_table(
        old_docs, key_col=key_col, text_col=text_col,
        n_hashes=n_hashes, bands=bands, shingle_n=shingle_n)

    w = Window.partitionBy("band", "bucket")
    ob_bounded = (
        ob.withColumn("bsize", F.count("*").over(w))
        .filter(F.col("bsize") <= max_bucket)
        .drop("bsize")
    )
    cand = (
        nb.select("band", "bucket", F.col(key_col).alias("new_key"))
        .join(ob_bounded.select(
            "band", "bucket", F.col(key_col).alias("old_key")),
            ["band", "bucket"])
        .select("new_key", "old_key")
        .distinct()
    )

    nsh = new_docs.select(
        F.col(key_col),
        F.explode(shingles_expr(text_col, shingle_n)).alias("shingle"),
    ).join(cand.select(F.col("new_key").alias(key_col)).distinct(),
           key_col, "left_semi")
    osh = old_docs.select(
        F.col(key_col),
        F.explode(shingles_expr(text_col, shingle_n)).alias("shingle"),
    ).join(cand.select(F.col("old_key").alias(key_col)).distinct(),
           key_col, "left_semi")

    n_sizes = nsh.groupBy(key_col).agg(F.count("*").alias("na"))
    o_sizes = osh.groupBy(key_col).agg(F.count("*").alias("nb"))

    inter = (
        nsh.select(F.col(key_col).alias("new_key"), "shingle")
        .join(osh.select(F.col(key_col).alias("old_key"), "shingle"),
              "shingle")
        .groupBy("new_key", "old_key")
        .agg(F.count("*").alias("n_common"))
        .join(cand, ["new_key", "old_key"], "left_semi")
    )
    jac = (
        inter
        .join(n_sizes.select(F.col(key_col).alias("new_key"), "na"),
              "new_key")
        .join(o_sizes.select(F.col(key_col).alias("old_key"), "nb"),
              "old_key")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("na") + F.col("nb") - F.col("n_common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    agg = jac.groupBy("new_key").agg(
        F.count("*").cast("long").alias("n_dups"),
        F.min("old_key").alias("dup_of"),
    )
    return (
        new_docs.select(key_col)
        .join(agg.withColumnRenamed("new_key", key_col), key_col, "left")
        .select(
            key_col,
            F.coalesce(F.col("n_dups"), F.lit(0).cast("long"))
            .alias("n_dups"),
            "dup_of",
            F.col("n_dups").isNull().alias("kept"),
        )
    )
