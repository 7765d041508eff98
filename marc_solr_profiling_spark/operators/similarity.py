"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline, and an LSH-bucketed
(random-hyperplane) variant as the scale path: signatures are per-row
(shuffle-free), candidates come from bucket joins, exact rescoring runs on
candidates only.

Everything stays JVM-side: dot products via ``F.zip_with`` +
``F.aggregate`` (codegen'd higher-order functions), no Python in the
scoring loop. Scores are float64, rounded for cross-engine checks.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Exact brute-force cosine top-k for one query vector.

    The query is a literal array (broadcast by value into the plan); the
    scan is embarrassingly parallel and top-k is TakeOrderedAndProject.
    Ties break by key ascending.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec)) or 1.0
    scored = embeddings.select(
        F.col(key_col),
        F.round(
            _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn)),
            round_to,
        ).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(key_col)).limit(k)


def pairwise_cosine_topk(
    embeddings: DataFrame,
    probe_keys: Sequence,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Top-k neighbors for each of a small probe set: broadcast the probes,
    one pass over the corpus, per-probe top-k via window rank.
    Output: (probe_id, neighbor_id, cosine, rank)."""
    from pyspark.sql import Window

    probes = embeddings.filter(F.col(key_col).isin(list(probe_keys))).select(
        F.col(key_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    )
    joined = embeddings.crossJoin(F.broadcast(probes)).filter(
        F.col(key_col) != F.col("probe_id")
    )
    scored = joined.select(
        "probe_id",
        F.col(key_col).alias("neighbor_id"),
        F.round(
            _dot(F.col(vec_col), F.col("probe_vec"))
            / (_norm(F.col(vec_col)) * _norm(F.col("probe_vec"))),
            round_to,
        ).alias("cosine"),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("probe_id", "rank")
    )


def hyperplane_lsh_buckets(
    embeddings: DataFrame,
    n_planes: int = 8,
    seed: int = 42,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Random-hyperplane LSH: sign pattern of <v, h_i> for n_planes seeded
    hyperplanes -> integer bucket. Cosine-near vectors collide with high
    probability. Per-row, shuffle-free; the bucket column then drives
    co-partitioned candidate joins (the IVF-style scale path)."""
    import numpy as np

    if dim is None:
        first = embeddings.select(F.size(vec_col)).first()
        dim = int(first[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    bucket = None
    for i in range(n_planes):
        h = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit = F.when(_dot(F.col(vec_col), h) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return embeddings.select(
        F.col(key_col), bucket.cast("int").alias("bucket")
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.8,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    sign_bits: int = 4,
    max_bucket: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the vector-space member of
    the dedup family (next to exact/MinHash-LSH/SimHash/n-gram Jaccard in
    operators/dedup.py): emit (key_a, key_b, cosine) for every candidate
    pair with cosine >= threshold.

    Candidate generation is a DETERMINISTIC sign-pattern LSH: bucket =
    bitmap of sign(e[i]) over the first ``sign_bits`` coordinates —
    coordinate hyperplanes instead of seeded random ones, so the oracle can
    replicate the bucketing in plain SQL and the check stays exact. Two
    vectors with cosine -> 1 agree on every sign bit, so true near-dups
    collide; the family's recall/selectivity trade is the usual LSH one
    (more bits = fewer candidates, seeded random hyperplanes or multi-probe
    widen recall — hyperplane_lsh_buckets provides that variant).

    Scale shape: bucketing is a pure per-row expression (no shuffle); the
    candidate join is an equi-join on bucket (co-partitioned, never
    all-pairs); exact cosine runs on candidates only, JVM-side.
    ``max_bucket`` guards degenerate buckets (e.g. zero-padded embeddings
    collapsing onto one pattern) exactly like the MinHash-LSH cap.
    """
    bucket = None
    for i in range(sign_bits):
        bit = F.when(
            F.element_at(F.col(vec_col), i + 1).cast("double") >= 0,
            F.lit(1 << i),
        ).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    tagged = embeddings.select(
        F.col(key_col), F.col(vec_col), bucket.cast("int").alias("bucket")
    )
    if max_bucket is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("bucket")
        tagged = (
            tagged.withColumn("_n", F.count("*").over(w))
            .filter(F.col("_n") <= max_bucket)
            .drop("_n")
        )
    a = tagged.select(
        F.col("bucket"),
        F.col(key_col).alias("key_a"),
        F.col(vec_col).alias("_va"),
    )
    b = tagged.select(
        F.col("bucket"),
        F.col(key_col).alias("key_b"),
        F.col(vec_col).alias("_vb"),
    )
    pairs = a.join(b, "bucket").filter(F.col("key_a") < F.col("key_b"))
    scored = pairs.select(
        "key_a",
        "key_b",
        F.round(
            _dot(F.col("_va"), F.col("_vb"))
            / (_norm(F.col("_va")) * _norm(F.col("_vb"))),
            round_to,
        ).alias("cosine"),
    )
    return scored.filter(F.col("cosine") >= threshold)


def ivf_assignments(
    embeddings: DataFrame,
    centroids,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest centroid
    by cosine.

    ``centroids`` is either a Python list of ``(cid, vector)`` pairs —
    centroids are by definition a small driver-sized set — or a small
    DataFrame ``(cid, cvec)``.

    Scale shape: with literal centroids the argmax is a PURE PER-ROW
    expression (array of per-centroid struct(ccos, -cid) -> array_max) —
    one corpus scan, ZERO shuffle, nothing materialized per (vector x
    centroid). With a DataFrame it is broadcast-product + a partial-
    aggregatable ``max_by`` per key (map-side combine; no window sort over
    the blown-up product — the round-1 window/row_number plan shuffled
    corpus x n_centroids rows).

    Determinism: cosine rounded to ``round_to`` before the argmax, ties
    break by cid ascending — the exact rule the SQL oracle applies.
    Output: (key, cid, ccos).
    """
    if isinstance(centroids, DataFrame):
        scored = embeddings.crossJoin(F.broadcast(centroids)).select(
            F.col(key_col),
            F.col("cid"),
            F.round(
                _dot(F.col(vec_col), F.col("cvec"))
                / (_norm(F.col(vec_col)) * _norm(F.col("cvec"))),
                round_to,
            ).alias("ccos"),
        )
        best = scored.groupBy(key_col).agg(
            F.max_by(
                F.struct("cid", "ccos"),
                F.struct(F.col("ccos"), (-F.col("cid")).alias("_nc")),
            ).alias("_best")
        )
        return best.select(key_col, "_best.cid", "_best.ccos")

    # literal-centroid path: per-row expression, no join, no shuffle
    best = _nearest_centroid_expr(vec_col, centroids, round_to)
    return embeddings.select(
        F.col(key_col),
        (-best["_nc"]).cast("long").alias("cid"),
        best["ccos"].alias("ccos"),
    )


def _nearest_centroid_expr(vec_col: str, centroids, round_to: int):
    """struct(ccos, -cid) of the nearest centroid, as one per-row
    expression: array of per-centroid structs -> array_max (struct compare
    = ccos first, then -cid, so ties resolve to the smallest cid)."""
    vnorm = _norm(F.col(vec_col))
    entries = []
    for cid, cvec in centroids:
        cv = [float(x) for x in cvec]
        carr = F.array(*[F.lit(x) for x in cv])
        cn = math.sqrt(sum(x * x for x in cv)) or 1.0
        ccos = F.round(_dot(F.col(vec_col), carr) / (vnorm * F.lit(cn)),
                       round_to)
        entries.append(F.struct(
            ccos.alias("ccos"), F.lit(-int(cid)).alias("_nc")
        ))
    return F.array_max(F.array(*entries))


def kmeans_sample_centroids(
    embeddings: DataFrame,
    k: int = 8,
    sample_n: int = 4096,
    n_iters: int = 10,
    seed: int = 42,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """Sampled k-means for IVF centroids (the scale path next to the
    deterministic first-k pick): draw <= ``sample_n`` vectors (one bounded
    collect — at 100 TB this is a ``TABLESAMPLE``-sized fetch, never the
    corpus), run Lloyd iterations on the driver with numpy over unit-
    normalized vectors (spherical k-means, matching the cosine metric),
    and return ``[(cid, centroid_vector), ...]`` ordered by cid.

    This is the k-means|| stand-in: a real 10^12-row deployment seeds from
    a distributed sample exactly like this; only the sampling transport
    changes. Deterministic for a fixed seed."""
    import numpy as np

    n_total = embeddings.count()
    frac = min(1.0, (sample_n * 1.2) / max(n_total, 1))
    sample = (
        embeddings.sample(fraction=frac, seed=seed)
        .limit(sample_n)
        .select(vec_col)
        .collect()
    )
    X = np.asarray([r[0] for r in sample], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(X.shape[0], size=min(k, X.shape[0]), replace=False)]
    for _ in range(n_iters):
        sims = X @ C.T
        assign = np.argmax(sims, axis=1)
        for j in range(C.shape[0]):
            members = X[assign == j]
            if members.size:
                m = members.mean(axis=0)
                C[j] = m / max(np.linalg.norm(m), 1e-12)
    return [(j, C[j].tolist()) for j in range(C.shape[0])]


def ann_ivf_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    n_centroids: int = 8,
    n_probe: int = 2,
    k: int = 10,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """IVF approximate NN: centroids are the first ``n_centroids`` corpus
    vectors by key (deterministic, oracle-replicable — at real scale use
    ``kmeans_sample_centroids``, which only changes the centroid list).
    The query probes its ``n_probe`` nearest centroids and brute-forces only
    those clusters.

    Scale shape: centroids are collected once (n_centroids rows — driver-
    sized by definition) and the assignment + probe filter become ONE pure
    per-row expression over a single corpus scan — no crossJoin
    materialization, no window, no shuffle before the final top-k (the
    inverted lists would be written once as a bucketed table at 100 TB).
    The probe set is computed with plain Python math on the collected
    centroids.
    """
    import math as _math

    cent_rows = (
        embeddings.orderBy(F.asc(key_col)).limit(n_centroids)
        .select(key_col, vec_col).collect()
    )
    centroids = [(int(r[0]), [float(x) for x in r[1]]) for r in cent_rows]

    # query-side probe list: nearest n_probe centroids to the query vector
    # (tie: cid asc), pure driver math on the tiny centroid list
    qv = [float(x) for x in query_vec]
    qn = _math.sqrt(sum(x * x for x in qv)) or 1.0
    qcos = []
    for cid, cvec in centroids:
        cn = _math.sqrt(sum(x * x for x in cvec)) or 1.0
        dot = sum(a * b for a, b in zip(cvec, qv))
        qcos.append((round(dot / (cn * qn), round_to), -cid))
    qcos.sort(reverse=True)
    probe_cids = {-nc for _, nc in qcos[:n_probe]}

    # assignment + probe filter fused into the scan itself: no self-join —
    # each row computes its nearest centroid inline and survives iff that
    # cid is probed
    best = _nearest_centroid_expr(vec_col, centroids, round_to)
    candidates = embeddings.filter(
        (-best["_nc"]).isin(sorted(probe_cids))
    )
    return cosine_topk(
        candidates, query_vec, key_col=key_col, vec_col=vec_col, k=k,
        round_to=round_to,
    )


def ann_lsh_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 1,
) -> DataFrame:
    """Approximate NN: restrict the exact scorer to the query's LSH bucket.

    ``n_probe`` is the recall knob: probe the query's own bucket plus the
    buckets reachable by flipping the ``n_probe - 1`` LEAST-CONFIDENT sign
    bits (smallest |<q, h_i>| — the hyperplanes the query sits closest to,
    so the likeliest side-errors for a true neighbor). Multi-probe trades
    one extra bucket scan per probe for recall, without building more hash
    tables; candidates stay a bucket-joined subset, never the corpus.
    """
    import numpy as np

    dim = len(query_vec)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    qv = np.asarray(query_vec, dtype=float)
    margins = planes @ qv
    qbucket = int(sum(1 << i for i in range(n_planes) if margins[i] >= 0))
    # flip order: ascending |margin| — the least-confident bits first
    flip_order = np.argsort(np.abs(margins), kind="stable")
    probes = [qbucket]
    for bit in flip_order[: max(0, int(n_probe) - 1)]:
        probes.append(qbucket ^ (1 << int(bit)))
    buckets = hyperplane_lsh_buckets(
        embeddings, n_planes=n_planes, seed=seed,
        key_col=key_col, vec_col=vec_col, dim=dim,
    )
    candidates = embeddings.join(
        buckets.filter(F.col("bucket").isin(probes)).select(key_col), key_col
    )
    return cosine_topk(candidates, query_vec, key_col=key_col, vec_col=vec_col, k=k)


def semdedup_prune(
    embeddings: DataFrame,
    threshold: float = 0.95,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    sign_bits: int = 4,
    max_bucket: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication — within each
    embedding-space cluster, drop every document whose cosine similarity
    to an already-kept cluster-mate exceeds ``threshold``. Returns
    ``(key, kept)`` for every input vector.

    Clustering stand-in: the deterministic sign-pattern LSH buckets of
    :func:`embedding_neardup_pairs` play the role of SemDeDup's k-means
    cells (the paper clusters only to bound the pairwise comparison to
    within-cell; any partition with the near-dup-collision property
    works, and sign-LSH keeps the oracle SQL-exact where seeded k-means
    would not). Keep rule: the paper keeps one representative per
    epsilon-group; here the representative is the smallest key — a
    vector is dropped iff some bucket-mate with a SMALLER key sits
    within ``threshold`` cosine. Deterministic, order-free, and exactly
    the rule the SQL twin replays.

    Scale shape: pair generation is the bucket-equi-join of
    ``embedding_neardup_pairs`` (co-partitioned candidates, never
    all-pairs; ``max_bucket`` caps degenerate cells); the keep flag is
    one key-only distinct + one left anti-style join — embeddings never
    shuffle a second time.
    """
    pairs = embedding_neardup_pairs(
        embeddings, threshold=threshold, key_col=key_col, vec_col=vec_col,
        sign_bits=sign_bits, max_bucket=max_bucket, round_to=round_to,
    )
    dropped = pairs.select(F.col("key_b").alias(key_col)).distinct()
    return embeddings.select(key_col).join(
        dropped.withColumn("_dup", F.lit(True)), key_col, "left"
    ).select(
        key_col,
        (~F.coalesce(F.col("_dup"), F.lit(False))).alias("kept"),
    )
