"""Embedding-similarity operators: near-dup pairs, LSH buckets, IVF.

The oracle-checked queries (knn_cosine / knn_ivf / embed_neardup) cover the
sf0.01 parquet path; these tests pin the operator semantics on constructed
vectors where the right answer is known by inspection.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from marc_solr_profiling_spark.operators.similarity import (
    cosine_topk,
    embedding_neardup_pairs,
    hyperplane_lsh_buckets,
    ivf_assignments,
)


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def test_embed_neardup_finds_near_pair_and_skips_far(spark):
    # 0 and 1 are near-identical (cosine ~1); 2 is orthogonal to both;
    # 3 is the negation of 0 (cosine -1, different sign bucket)
    df = _emb(
        spark,
        [
            (0, [1.0, 0.5, 0.25, 0.1]),
            (1, [1.0, 0.5, 0.25, 0.11]),
            (2, [-0.1, 0.9, -0.8, 0.7]),
            (3, [-1.0, -0.5, -0.25, -0.1]),
        ],
    )
    out = embedding_neardup_pairs(df, threshold=0.9, sign_bits=4).collect()
    assert [(r["key_a"], r["key_b"]) for r in out] == [(0, 1)]
    assert out[0]["cosine"] == pytest.approx(1.0, abs=1e-3)


def test_embed_neardup_bucket_blocks_cross_bucket_pairs(spark):
    # identical direction but opposite first-coordinate sign: different
    # bucket, so never a candidate even at threshold 0 (LSH semantics —
    # candidates only come from colliding buckets)
    df = _emb(spark, [(0, [0.001, 1.0, 1.0, 1.0]), (1, [-0.001, 1.0, 1.0, 1.0])])
    assert embedding_neardup_pairs(df, threshold=0.0, sign_bits=4).count() == 0


def test_embed_neardup_max_bucket_cap(spark):
    # 5 co-bucketed identical vectors -> C(5,2)=10 pairs; cap 4 drops the
    # bucket entirely (the mega-bucket guard)
    rows = [(i, [1.0, 1.0, 1.0, 1.0]) for i in range(5)]
    df = _emb(spark, rows)
    assert embedding_neardup_pairs(df, threshold=0.5).count() == 10
    assert embedding_neardup_pairs(df, threshold=0.5, max_bucket=4).count() == 0


def test_embed_neardup_plan_has_no_cartesian(spark):
    df = _emb(spark, [(i, [1.0 * i, 1.0, 1.0, 1.0]) for i in range(8)])
    plan = embedding_neardup_pairs(df, threshold=0.5)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cosine_topk_exact_order(spark):
    df = _emb(
        spark,
        [
            (0, [1.0, 0.0]),
            (1, [math.sqrt(0.5), math.sqrt(0.5)]),
            (2, [0.0, 1.0]),
            (3, [-1.0, 0.0]),
        ],
    )
    out = cosine_topk(df, [1.0, 0.0], k=3).collect()
    assert [r["vec_id"] for r in out] == [0, 1, 2]
    assert out[0]["cosine"] == pytest.approx(1.0)
    assert out[1]["cosine"] == pytest.approx(math.sqrt(0.5), abs=1e-6)


def test_hyperplane_buckets_colocate_identical_vectors(spark):
    df = _emb(spark, [(0, [1.0, 2.0, 3.0]), (1, [1.0, 2.0, 3.0]),
                      (2, [-1.0, -2.0, -3.0])])
    rows = {r["vec_id"]: r["bucket"]
            for r in hyperplane_lsh_buckets(df, n_planes=6).collect()}
    assert rows[0] == rows[1]
    assert rows[0] != rows[2]  # antipodal vectors flip every sign


def test_ann_lsh_multiprobe_covers_both_halfspaces(spark):
    """With one hyperplane there are exactly two buckets; probing 2 buckets
    makes the 'approximate' search exhaustive, so it must equal brute
    force — and single-probe must return a subset of its candidates."""
    from marc_solr_profiling_spark.operators.similarity import ann_lsh_topk

    rng_rows = [(i, [((i * 37 + j * 11) % 17 - 8) / 8.0 for j in range(4)])
                for i in range(40)]
    df = _emb(spark, rng_rows)
    q = [0.3, -0.2, 0.9, 0.1]
    exact = [(r["vec_id"], r["cosine"])
             for r in cosine_topk(df, q, k=5).collect()]
    probe2 = [(r["vec_id"], r["cosine"])
              for r in ann_lsh_topk(df, q, k=5, n_planes=1, n_probe=2).collect()]
    assert probe2 == exact
    # single-probe: possibly partial recall, but every returned score must
    # be the true cosine (the rescoring stage is exact)
    all_cos = {r["vec_id"]: r["cosine"]
               for r in cosine_topk(df, q, k=40).collect()}
    probe1 = ann_lsh_topk(df, q, k=5, n_planes=1, n_probe=1).collect()
    assert 0 < len(probe1) <= 5
    for r in probe1:
        assert r["cosine"] == pytest.approx(all_cos[r["vec_id"]])


def test_ivf_assignment_literal_matches_dataframe_path(spark):
    df = _emb(spark, [(i, [float(i % 3 == j) + 0.01 * i for j in range(3)])
                      for i in range(9)])
    cents = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]), (2, [0.0, 0.0, 1.0])]
    lit = {(r["vec_id"], r["cid"])
           for r in ivf_assignments(df, cents).collect()}
    cdf = spark.createDataFrame(cents, "cid long, cvec array<float>")
    dfp = {(r["vec_id"], r["cid"])
           for r in ivf_assignments(df, cdf).collect()}
    assert lit == dfp


def test_semdedup_prune_keeps_smallest_key_per_group(spark):
    from marc_solr_profiling_spark.operators.similarity import semdedup_prune

    # {0, 1, 4} near-identical in one sign cell; 2 alone in another cell;
    # 3 shares 0's cell but is far from everything (below threshold)
    df = _emb(
        spark,
        [
            (0, [1.0, 0.5, 0.25, 0.1]),
            (1, [1.0, 0.5, 0.25, 0.11]),
            (2, [-0.1, 0.9, -0.8, 0.7]),
            (3, [0.9, 0.01, 0.9, 0.01]),
            (4, [1.0, 0.5, 0.26, 0.1]),
        ],
    )
    got = {r["vec_id"]: r["kept"] for r in
           semdedup_prune(df, threshold=0.9, sign_bits=4).collect()}
    # representative (smallest key) of the near-dup group survives;
    # its two >=0.9-cosine cell-mates are dropped; singletons survive
    assert got == {0: True, 1: False, 2: True, 3: True, 4: False}


def test_semdedup_prune_oracle_twin_nonvacuous(spark):
    import duckdb

    from marc_solr_profiling_spark.queries import ORACLE_SQL, QUERIES

    sf = "/root/testdata/sf0.001"
    got = {r["vec_id"]: r["kept"]
           for r in QUERIES["semdedup_prune"](spark, sf).collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'")
    want = dict(con.execute(ORACLE_SQL["semdedup_prune"]).fetchall())
    assert got == want
    assert any(got.values()) and not all(got.values())  # some drops happen
