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


def ivf_assignments(
    embeddings: DataFrame,
    centroids: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest centroid
    by cosine. ``centroids`` is a SMALL DataFrame (cid, cvec) — broadcast;
    the assignment is one scan + per-row argmax (window over the broadcast
    product, partitioned by vector key so no global shuffle of the corpus).

    Determinism: cosine rounded to ``round_to`` before the argmax, ties
    break by cid ascending — the exact rule the SQL oracle applies.
    Output: (key, cid, ccos).
    """
    from pyspark.sql import Window

    scored = embeddings.crossJoin(F.broadcast(centroids)).select(
        F.col(key_col),
        F.col("cid"),
        F.round(
            _dot(F.col(vec_col), F.col("cvec"))
            / (_norm(F.col(vec_col)) * _norm(F.col("cvec"))),
            round_to,
        ).alias("ccos"),
    )
    w = Window.partitionBy(key_col).orderBy(F.desc("ccos"), F.asc("cid"))
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .drop("_r")
    )


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
    vectors by key (deterministic, oracle-replicable — at real scale these
    come from a k-means sample, which only changes the centroid table).
    The query probes its ``n_probe`` nearest centroids and brute-forces only
    those clusters.

    Scale shape: the assignment is one broadcast-product scan (the inverted
    lists would be written once as a bucketed table); the probe filters the
    corpus to ~n_probe/n_centroids of its rows before exact scoring.
    """
    import math as _math

    centroids = embeddings.orderBy(F.asc(key_col)).limit(n_centroids).select(
        F.col(key_col).alias("cid"), F.col(vec_col).alias("cvec")
    )
    assign = ivf_assignments(
        embeddings, centroids, key_col=key_col, vec_col=vec_col,
        round_to=round_to,
    )
    # query-side probe list: tiny (n_centroids rows) — computed in Spark for
    # one plan, but it is a driver-sized problem
    qn = _math.sqrt(sum(float(x) * float(x) for x in query_vec)) or 1.0
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probe = (
        centroids.select(
            "cid",
            F.round(
                _dot(F.col("cvec"), q) / (_norm(F.col("cvec")) * F.lit(qn)),
                round_to,
            ).alias("qcos"),
        )
        .orderBy(F.desc("qcos"), F.asc("cid"))
        .limit(n_probe)
        .select("cid")
    )
    cand_keys = assign.join(F.broadcast(probe), "cid").select(key_col)
    candidates = embeddings.join(cand_keys, key_col)
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
) -> DataFrame:
    """Approximate NN: restrict the exact scorer to the query's LSH bucket.
    (Recall grows with multi-probe — flipping one bit at a time — left as
    the documented scale knob.)"""
    import numpy as np

    dim = len(query_vec)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    qbucket = 0
    for i in range(n_planes):
        if float(np.dot(planes[i], np.asarray(query_vec, dtype=float))) >= 0:
            qbucket |= 1 << i
    buckets = hyperplane_lsh_buckets(
        embeddings, n_planes=n_planes, seed=seed,
        key_col=key_col, vec_col=vec_col, dim=dim,
    )
    candidates = embeddings.join(
        buckets.filter(F.col("bucket") == qbucket).select(key_col), key_col
    )
    return cosine_topk(candidates, query_vec, key_col=key_col, vec_col=vec_col, k=k)
