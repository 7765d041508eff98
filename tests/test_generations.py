"""Generational (Lucene-segment-style) index maintenance: append_delta
generations + delete masking + tiered merge produce query results
value-identical to a from-scratch rebuild of the live corpus — with
O(|delta|) work per append (plans/generations.py; the scale answer to
incremental_update's full re-segment)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from marc_solr_profiling_spark.corpus import generate_web_pages
from marc_solr_profiling_spark.operators.phrase import phrase_topk
from marc_solr_profiling_spark.operators.wand import wand_topk, wand_topk_batch
from marc_solr_profiling_spark.plans.build import build_index
from marc_solr_profiling_spark.plans.generations import (
    append_delta,
    force_merge,
    maybe_compact,
    merge_generations,
)

QUERIES = ["the of and", "fresh content", "voyage", "time new said",
           "sea captain whale"]


@pytest.fixture(scope="module")
def workdir():
    d = tempfile.mkdtemp(prefix="gen_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def docs(spark):
    d = (
        generate_web_pages(spark, 260, seed=11, partitions=4)
        .select("url", "text")
        .persist()
    )
    d.count()
    yield d
    d.unpersist()


def _topk_urls(idx, q, k=10):
    rows = wand_topk(idx, q, k=k, with_url=True).collect()
    return [(r["url"], round(r["score"], 9)) for r in rows]


def _assert_same_results(got_idx, ref_idx, queries=QUERIES, k=10):
    for q in queries:
        got = _topk_urls(got_idx, q, k)
        want = _topk_urls(ref_idx, q, k)
        # internal doc ids differ between the chains and the rebuild, so
        # equal-score boundary ties may order differently; compare the
        # score sequence exactly and membership as a set
        assert [s for _, s in got] == [s for _, s in want], q
        assert set(got) == set(want), q


def _live(docs, dead_urls, mods=None):
    out = docs.filter(~F.col("url").isin(list(dead_urls)))
    if mods is not None:
        out = out.join(mods.select("url"), "url", "left_anti").unionByName(mods)
    return out


def test_append_upsert_delete_rank_identity(spark, workdir, docs):
    base = docs.filter(F.regexp_extract("url", r"/p/(\d+)$", 1) < 200)
    rest = docs.filter(F.regexp_extract("url", r"/p/(\d+)$", 1) >= 200)
    mods = base.filter(F.xxhash64("url") % 11 == 0).withColumn(
        "text", F.concat(F.lit("fresh content entirely "), F.col("text"))
    ).persist()
    del_keys = base.filter(F.xxhash64("url") % 13 == 1).select("url").persist()

    base_idx = build_index(
        spark, base, f"{workdir}/a_base", key_col="url",
        chain="text", n_salts=4, block_size=32,
    )
    gen1 = append_delta(
        spark, base_idx, f"{workdir}/a_gen1",
        delta_docs=rest.unionByName(mods), delete_keys=del_keys,
        key_col="url",
    )
    assert len(gen1.stores) == 2
    assert gen1.deleted_array() is not None

    dead = {r["url"] for r in del_keys.collect()}
    live = _live(docs, dead, mods.filter(~F.col("url").isin(list(dead))))
    ref_idx = build_index(
        spark, live, f"{workdir}/a_ref", key_col="url",
        chain="text", n_salts=4, block_size=32,
    )
    # exact global stats
    assert gen1.n_docs == ref_idx.n_docs
    assert abs(gen1.avgdl - ref_idx.avgdl) < 1e-9
    # exact dictionary (df AND cf per term)
    got_d = {r["term"]: (r["df"], r["cf"])
             for r in gen1.dictionary.collect()}
    want_d = {r["term"]: (r["df"], r["cf"])
              for r in ref_idx.dictionary.collect()}
    assert got_d == want_d
    _assert_same_results(gen1, ref_idx)
    # tombstoned urls never surface
    for q in QUERIES:
        assert not {u for u, _ in _topk_urls(gen1, q, 20)} & dead
    mods.unpersist()
    del_keys.unpersist()


def test_three_generation_chain_and_batch(spark, workdir, docs):
    n = F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
    base = docs.filter(n < 150)
    d1 = docs.filter((n >= 150) & (n < 200))
    d2 = docs.filter(n >= 200)

    idx0 = build_index(
        spark, base, f"{workdir}/b_base", key_col="url",
        chain="text", n_salts=4, block_size=32,
    )
    idx1 = append_delta(spark, idx0, f"{workdir}/b_g1", delta_docs=d1,
                        key_col="url")
    del2 = base.filter(F.xxhash64("url") % 7 == 2).select("url").persist()
    idx2 = append_delta(spark, idx1, f"{workdir}/b_g2", delta_docs=d2,
                        delete_keys=del2, key_col="url")
    assert len(idx2.stores) == 3

    dead = {r["url"] for r in del2.collect()}
    ref = build_index(
        spark, _live(docs, dead), f"{workdir}/b_ref", key_col="url",
        chain="text", n_salts=4, block_size=32,
    )
    _assert_same_results(idx2, ref)

    # the batch kernels (dense AND sparse) mask tombstones too
    for mode in ("dense", "sparse"):
        got = wand_topk_batch(idx2, QUERIES, k=10, mode=mode)
        want = wand_topk_batch(ref, QUERIES, k=10, mode=mode)
        g = {(r["qid"], r["rank"]): round(r["score"], 9)
             for r in got.collect()}
        w = {(r["qid"], r["rank"]): round(r["score"], 9)
             for r in want.collect()}
        assert g == w, mode
    del2.unpersist()


def test_pure_delete_generation(spark, workdir, docs):
    base_idx = build_index(
        spark, docs, f"{workdir}/c_base", key_col="url",
        chain="text", n_salts=4, block_size=32,
    )
    del_keys = docs.filter(F.xxhash64("url") % 5 == 0).select("url")
    gen = append_delta(spark, base_idx, f"{workdir}/c_del",
                       delete_keys=del_keys, key_col="url")
    dead = {r["url"] for r in del_keys.collect()}
    ref = build_index(
        spark, _live(docs, dead), f"{workdir}/c_ref", key_col="url",
        chain="text", n_salts=4, block_size=32,
    )
    assert gen.n_docs == ref.n_docs
    assert abs(gen.avgdl - ref.avgdl) < 1e-9
    _assert_same_results(gen, ref)


def test_merge_generations_keep_base(spark, workdir, docs):
    n = F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
    idx0 = build_index(
        spark, docs.filter(n < 150), f"{workdir}/d_base", key_col="url",
        chain="text", n_salts=4, block_size=32,
    )
    idx1 = append_delta(spark, idx0, f"{workdir}/d_g1",
                        delta_docs=docs.filter((n >= 150) & (n < 200)),
                        key_col="url")
    # delete one url from the BASE and one from GEN1 — after a keep=1
    # merge the gen1 tombstone must be physically applied, the base one
    # carried forward in the delete set
    del_base = docs.filter(n == 3).select("url")
    del_g1 = docs.filter(n == 160).select("url")
    idx2 = append_delta(spark, idx1, f"{workdir}/d_g2",
                        delta_docs=docs.filter(n >= 200),
                        delete_keys=del_base.union(del_g1), key_col="url")
    assert len(idx2.stores) == 3

    merged = merge_generations(spark, idx2, f"{workdir}/d_merged", keep=1)
    assert len(merged.stores) == 2
    # only the base-generation tombstone survives in the delete set
    dels = merged.deletes_df()
    assert dels is not None and dels.count() == 1
    _assert_same_results(merged, idx2)
    assert merged.n_docs == idx2.n_docs
    assert abs(merged.avgdl - idx2.avgdl) < 1e-12


def test_force_merge_collapses_chain(spark, workdir, docs):
    n = F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
    idx0 = build_index(
        spark, docs.filter(n < 200), f"{workdir}/e_base", key_col="url",
        chain="text", n_salts=4, block_size=32,
    )
    idx1 = append_delta(spark, idx0, f"{workdir}/e_g1",
                        delta_docs=docs.filter(n >= 200),
                        delete_keys=docs.filter(n % 9 == 4).select("url"),
                        key_col="url")
    merged = force_merge(spark, idx1, f"{workdir}/e_opt")
    assert len(merged.stores) == 1
    assert merged.deletes_df() is None  # deletes applied physically
    _assert_same_results(merged, idx1)
    assert merged.n_docs == idx1.n_docs


def test_maybe_compact_policy(spark, workdir, docs):
    n = F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
    idx = build_index(
        spark, docs.filter(n < 100), f"{workdir}/f_base", key_col="url",
        chain="text", n_salts=4, block_size=32,
    )
    for i, lo in enumerate([100, 150, 200]):
        idx = append_delta(
            spark, idx, f"{workdir}/f_g{i}",
            delta_docs=docs.filter((n >= lo) & (n < lo + 50)),
            key_col="url")
    assert len(idx.stores) == 4
    same = maybe_compact(spark, idx, f"{workdir}/f_c0", max_generations=4)
    assert same is idx  # under threshold: no-op
    compacted = maybe_compact(spark, idx, f"{workdir}/f_c1",
                              max_generations=3, keep=1)
    assert len(compacted.stores) == 2
    _assert_same_results(compacted, idx)


def test_positional_chain_phrase_masking(spark, workdir, docs):
    n = F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
    idx0 = build_index(
        spark, docs.filter(n < 200), f"{workdir}/g_base", key_col="url",
        chain="text", n_salts=4, block_size=32, positions=True,
    )
    # find a phrase hit inside the base, then tombstone that very doc
    hit = phrase_topk(idx0, "of the", k=1, with_url=True).collect()
    assert hit, "corpus must contain the probe phrase"
    victim_url = hit[0]["url"]
    idx1 = append_delta(
        spark, idx0, f"{workdir}/g_g1",
        delta_docs=docs.filter(n >= 200),
        delete_keys=spark.createDataFrame([(victim_url,)], "url string"),
        key_col="url")
    got = phrase_topk(idx1, "of the", k=20, with_url=True).collect()
    assert victim_url not in {r["url"] for r in got}
    # and the phrase path over the chain equals a rebuild of the live set
    ref = build_index(
        spark, _live(docs, {victim_url}), f"{workdir}/g_ref",
        key_col="url", chain="text", n_salts=4, block_size=32,
        positions=True,
    )
    want = phrase_topk(ref, "of the", k=20, with_url=True).collect()
    assert ([round(r["score"], 9) for r in got]
            == [round(r["score"], 9) for r in want])
    assert ({(r["url"], round(r["score"], 9)) for r in got}
            == {(r["url"], round(r["score"], 9)) for r in want})


def test_kill_mid_append_resumes_without_recompute(spark, workdir, docs,
                                                   monkeypatch):
    """Kill-mid-APPEND resume (the north-rule resumability criterion for
    the generational path): abort append_delta after its tf stage commits
    but before the delta segments commit, re-run, and assert via lineage
    timestamps that the delta is NOT re-tokenized and the resumed chain
    equals an uninterrupted append."""
    from marc_solr_profiling_spark.plans import lineage as lin

    n = F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
    base = docs.filter(n < 200)
    delta = docs.filter(n >= 200)
    kw = dict(key_col="url", chain="text", n_salts=4, block_size=32)
    idx0 = build_index(spark, base, f"{workdir}/h_base", **kw)

    ref = append_delta(spark, idx0, f"{workdir}/h_ref", delta_docs=delta,
                       key_col="url")

    out = f"{workdir}/h_resume"
    real_commit = lin.IndexStore.commit_stage

    def failing_commit(self, stage, df, **kwargs):
        if stage == "segments" and self.path == out:
            raise RuntimeError("simulated kill mid-append")
        return real_commit(self, stage, df, **kwargs)

    monkeypatch.setattr(lin.IndexStore, "commit_stage", failing_commit)
    with pytest.raises(RuntimeError, match="simulated kill"):
        append_delta(spark, idx0, out, delta_docs=delta, key_col="url")
    monkeypatch.setattr(lin.IndexStore, "commit_stage", real_commit)

    m_aborted = lin.IndexStore(out)._read_manifest()
    assert "tf" in m_aborted["stages"]
    assert "segments" not in m_aborted["stages"]
    pre = {st: m_aborted["stages"][st]["committed_at"]
           for st in m_aborted["stages"]}

    idx = append_delta(spark, idx0, out, delta_docs=delta, key_col="url")
    m_resumed = idx.store._read_manifest()
    for st, ts in pre.items():
        assert m_resumed["stages"][st]["committed_at"] == ts, (
            f"stage {st} recomputed on append resume")
    for st in ["docs", "stats", "dictionary", "segments"]:
        got = sorted(map(tuple, idx.store.read_stage(spark, st).collect()))
        want = sorted(map(tuple, ref.store.read_stage(spark, st).collect()))
        assert got == want, f"stage {st} differs after append resume"
    _assert_same_results(idx, ref)


def test_multifield_generation_chain(spark, workdir, docs):
    """Generational appends for the MULTI-FIELD (edismax) index: a
    2-generation chain with upserts+deletes is dismax-value-identical to
    a from-scratch rebuild of the live corpus (per-field stats and the
    field-scoped dictionary exactly adjusted; tombstones masked in the
    dismax kernel; per-field cap rescaling)."""
    from marc_solr_profiling_spark.operators.wand import dismax_topk
    from marc_solr_profiling_spark.plans.generations import (
        append_delta_multifield,
    )
    from marc_solr_profiling_spark.plans.multifield import (
        build_multifield_index,
    )

    n = F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
    base = docs.filter(n < 200)
    mods = base.filter(F.xxhash64("url") % 9 == 0).withColumn(
        "text", F.concat(F.lit("revised heading material "),
                         F.col("text")))
    dels = base.filter(F.xxhash64("url") % 11 == 3).select("url")
    fields = [("title", 8), ("body", None)]

    idx0 = build_multifield_index(
        spark, base, f"{workdir}/mf_base", fields=fields, key_col="url",
        chain="text", n_salts=4, block_size=32,
    )
    idx1 = append_delta_multifield(
        spark, idx0, f"{workdir}/mf_g1",
        delta_docs=docs.filter(n >= 200).unionByName(mods),
        delete_keys=dels, key_col="url",
    )
    assert len(idx1.stores) == 2
    dead = {r["url"] for r in dels.collect()}
    live = _live(docs, dead, mods.filter(~F.col("url").isin(list(dead))))
    ref = build_multifield_index(
        spark, live, f"{workdir}/mf_ref", fields=fields, key_col="url",
        chain="text", n_salts=4, block_size=32,
    )
    assert idx1.field_stats == ref.field_stats
    got_d = {r["term"]: (r["df"], r["cf"])
             for r in idx1.dictionary.collect()}
    want_d = {r["term"]: (r["df"], r["cf"])
              for r in ref.dictionary.collect()}
    assert got_d == want_d

    qf = {"title": 2.0, "body": 1.0}
    for q in QUERIES:
        def urls(ix):
            out = dismax_topk(ix, q, qf=qf, tie=0.1, k=10, round_to=6)
            rows = out.join(ix.docs.select("doc_id", "url"),
                            "doc_id").collect()
            return {(r["url"], r["score"]) for r in rows}, \
                sorted((r["score"] for r in rows), reverse=True)

        g_set, g_sc = urls(idx1)
        w_set, w_sc = urls(ref)
        assert g_sc == w_sc, q
        assert g_set == w_set, q
        assert not {u for u, _ in g_set} & dead, q


def test_multifield_force_merge(spark, workdir, docs):
    """Collapsing a multifield chain (merge keep=0 — the optimize
    analog) keeps dismax results identical and drops the delete set."""
    from marc_solr_profiling_spark.operators.wand import dismax_topk
    from marc_solr_profiling_spark.plans.generations import (
        append_delta_multifield,
        merge_generations_multifield,
    )
    from marc_solr_profiling_spark.plans.multifield import (
        build_multifield_index,
    )

    n = F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
    fields = [("title", 8), ("body", None)]
    idx0 = build_multifield_index(
        spark, docs.filter(n < 200), f"{workdir}/mfm_base",
        fields=fields, key_col="url", chain="text", n_salts=4,
        block_size=32,
    )
    idx1 = append_delta_multifield(
        spark, idx0, f"{workdir}/mfm_g1",
        delta_docs=docs.filter(n >= 200),
        delete_keys=docs.filter(n % 13 == 5).select("url"),
        key_col="url",
    )
    merged = merge_generations_multifield(
        spark, idx1, f"{workdir}/mfm_opt", keep=0)
    assert len(merged.stores) == 1
    assert merged.deletes_df() is None
    qf = {"title": 2.0, "body": 1.0}
    for q in QUERIES[:3]:
        def res(ix):
            out = dismax_topk(ix, q, qf=qf, tie=0.1, k=10, round_to=6)
            rows = out.join(ix.docs.select("doc_id", "url"),
                            "doc_id").collect()
            return ({(r["url"], r["score"]) for r in rows},
                    sorted((r["score"] for r in rows), reverse=True))

        g, gs = res(merged)
        w, ws = res(idx1)
        assert gs == ws, q
        assert g == w, q


def test_cap_rescaling_under_strong_avgdl_drift(spark, workdir):
    """Adversarial pruning-exactness check: the base is built on SHORT
    docs (small avgdl), the delta appends LONG docs that multiply the
    global avgdl — the regime where stale base-generation block caps
    UNDERSTATE true BM25 weights and unsound pruning would silently drop
    true top-k docs. The chain must stay value-identical to a rebuild."""
    short = generate_web_pages(spark, 150, seed=31, partitions=4) \
        .select("url", F.expr(
            "array_join(slice(split(text, ' '), 1, 12), ' ')").alias("text"))
    long_ = generate_web_pages(spark, 150, seed=32, partitions=4) \
        .select(F.concat(F.lit("L"), "url").alias("url"),
                F.concat_ws(" ", "text", "text", "text").alias("text"))
    idx0 = build_index(
        spark, short, f"{workdir}/drift_base", key_col="url",
        chain="text", n_salts=4, block_size=16,
    )
    chain = append_delta(spark, idx0, f"{workdir}/drift_g1",
                         delta_docs=long_, key_col="url")
    # the drift is real: appended avgdl must dwarf the built one
    built = idx0.avgdl
    assert chain.avgdl > 3 * built
    ref = build_index(
        spark, short.unionByName(long_), f"{workdir}/drift_ref",
        key_col="url", chain="text", n_salts=4, block_size=16,
    )
    _assert_same_results(chain, ref, k=15)


def test_grouped_phys_over_generation_chain(spark, workdir, docs):
    """grouped_topk_phys (per-salt grouping collector) over a 2-gen
    chain with deletes equals the rebuild — group counts included."""
    from marc_solr_profiling_spark.operators.wand import grouped_topk_phys

    n = F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
    aug = docs.withColumn(
        "grp", F.concat(F.lit("g"), (n % 4).cast("string")))
    base = aug.filter(n < 200).select("url", "text", "grp")
    rest = aug.filter(n >= 200).select("url", "text", "grp")
    dels = aug.filter(n % 17 == 2).select("url")
    idx0 = build_index(
        spark, base, f"{workdir}/gg_base", key_col="url", chain="text",
        n_salts=4, block_size=32, filter_cols=["grp"],
    )
    chain = append_delta(spark, idx0, f"{workdir}/gg_g1",
                         delta_docs=rest, delete_keys=dels,
                         key_col="url")
    dead = {r["url"] for r in dels.collect()}
    ref = build_index(
        spark, _live(aug.select("url", "text", "grp"), dead),
        f"{workdir}/gg_ref", key_col="url", chain="text",
        n_salts=4, block_size=32, filter_cols=["grp"],
    )

    def res(ix):
        out = grouped_topk_phys(ix, "the of and", "grp", k_groups=4,
                                k_per_group=2, round_to=6)
        rows = out.join(ix.docs.select("doc_id", "url"),
                        "doc_id").collect()
        return {(r["grp"], r["group_found"], r["rank"], r["url"],
                 r["score"]) for r in rows}

    assert res(chain) == res(ref)


def test_append_refuses_live_chain_out_path(spark, workdir, docs):
    """append_delta(out_path=<a live store of the chain>) must fail
    loudly: set_fingerprint would wipe the ancestor's stages and write a
    self-referential parent (the at-least-once replay corruption)."""
    n = F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
    base = build_index(
        spark, docs.filter(n < 60), f"{workdir}/guard_base", key_col="url",
        chain="text", n_salts=4, block_size=32,
    )
    with pytest.raises(ValueError, match="live store"):
        append_delta(
            spark, base, f"{workdir}/guard_base",
            delta_docs=docs.filter((n >= 60) & (n < 70)), key_col="url",
        )
    g1 = append_delta(
        spark, base, f"{workdir}/guard_g1",
        delta_docs=docs.filter((n >= 60) & (n < 70)), key_col="url",
    )
    for bad in (f"{workdir}/guard_base", f"{workdir}/guard_g1"):
        with pytest.raises(ValueError, match="live store"):
            append_delta(
                spark, g1, bad,
                delta_docs=docs.filter((n >= 70) & (n < 75)),
                key_col="url",
            )


def test_append_dedups_same_key_within_delta(spark, workdir, docs):
    """Two same-key rows in ONE delta batch must collapse to a single
    live row (one-record-per-id contract): latest warc_ts wins when
    present, else exactly one row survives."""
    n = F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
    base = build_index(
        spark, docs.filter(n < 50), f"{workdir}/dup_base", key_col="url",
        chain="text", n_salts=4, block_size=32,
    )
    dup_url = docs.filter(n == 3).select("url").collect()[0]["url"]
    delta = spark.createDataFrame(
        [(dup_url, "stale body crabapple", "2024-01-01 00:00:00"),
         (dup_url, "fresh body dragonfruit", "2024-06-01 00:00:00")],
        "url string, text string, warc_ts string",
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    g1 = append_delta(spark, base, f"{workdir}/dup_g1",
                      delta_docs=delta, key_col="url")
    live = g1.docs.filter(F.col("url") == dup_url).collect()
    assert len(live) == 1, "duplicate-key delta must leave ONE live row"
    assert g1.n_docs == 50
    # the later warc_ts row won: its term is searchable, the stale isn't
    assert wand_topk(g1, "dragonfruit", k=5).count() == 1
    assert wand_topk(g1, "crabapple", k=5).count() == 0
    # without warc_ts: still exactly one survivor
    delta2 = spark.createDataFrame(
        [(dup_url, "alpha kumquat"), (dup_url, "alpha kumquat")],
        "url string, text string")
    g2 = append_delta(spark, g1, f"{workdir}/dup_g2",
                      delta_docs=delta2, key_col="url")
    assert g2.docs.filter(F.col("url") == dup_url).count() == 1
    assert g2.n_docs == 50
