"""Incremental maintenance: upsert + delete merge (batch-incremental shape).

Re-expresses the reference's 3-way sorted merge
(``MarcMerger.processMergeRecords``, ``core/src/org/solrmarc/marc/
MarcMerger.java:251-364``: mods win over base, new ids inserted, deleted ids
dropped) and delete-list application (``MarcImporter.deleteRecords``,
``MarcImporter.java:348-416``) as declarative joins — on Iceberg this is
literally ``MERGE INTO``; expressed here engine-agnostically so it also runs
on plain parquet-backed tables:

    result = (base ANTI-JOIN mods-keys ANTI-JOIN deletes)
             UNION ALL (mods ANTI-JOIN deletes)

Join-strategy note (100 TB shape): the mod/delete key sets are UNBOUNDED —
a nightly delta can be 10% of the corpus — so the anti-joins carry NO
forced broadcast hint. AQE + ``autoBroadcastJoinThreshold`` pick a
broadcast hash join when the key side measures small at runtime and fall
back to a shuffled sort-merge/hash join when it doesn't; a hard
``F.broadcast()`` here would be a driver/executor OOM at scale, not a plan
choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def merge_upsert_delete(
    base: DataFrame,
    mods: DataFrame | None = None,
    deletes: DataFrame | None = None,
    key_col: str = "url",
) -> DataFrame:
    """Apply mods (upsert: replace matching keys, insert new keys) and
    deletes (drop keys; deleting a missing key is a no-op, matching
    ``MarcMerger.java:366-444`` set semantics)."""
    result = base
    if mods is not None:
        mod_keys = mods.select(key_col).distinct()
        result = result.join(mod_keys, key_col, "left_anti")
        result = result.unionByName(mods)
    if deletes is not None:
        del_keys = deletes.select(key_col).distinct()
        result = result.join(del_keys, key_col, "left_anti")
    return result


def delete_by_keys(df: DataFrame, delete_keys: DataFrame,
                   key_col: str = "url") -> DataFrame:
    """Delete-list application: left-anti semi-join (the ``.del`` file path,
    ``MarcImporter.java:348-416``). No broadcast hint — see module note."""
    return df.join(
        delete_keys.select(key_col).distinct(), key_col, "left_anti"
    )


def realtime_get(
    base: DataFrame,
    ids,
    pending_upserts: DataFrame | None = None,
    pending_deletes: DataFrame | None = None,
    key_col: str = "url",
) -> DataFrame:
    """RealTimeGetHandler analog (``/get``, solrconfig.xml:57-61): the
    LATEST version of each requested doc without waiting for a commit —
    a pending upsert shadows the committed base row, a pending delete
    hides it. In Solr this reads the update log; here the "update log"
    is whatever uncommitted delta DataFrames the ingest currently holds.

    Scale shape: ``ids`` is a small literal list, so the IN filter pushes
    into every scan (base AND delta) before any join — the joins then run
    over at most ``len(ids)`` rows per side, which AQE resolves to
    broadcasts. Never filters after the overlay."""
    from pyspark.sql import functions as F

    want = F.col(key_col).isin(list(ids))
    out = merge_upsert_delete(
        base.filter(want),
        mods=pending_upserts.filter(want) if pending_upserts is not None
        else None,
        deletes=pending_deletes.filter(want) if pending_deletes is not None
        else None,
        key_col=key_col,
    )
    return out


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "id",
    value_cols: "list[str] | None" = None,
) -> DataFrame:
    """Record-level diff of two corpus snapshots — the MarcDiff utility
    (``core/src/org/solrmarc/tools/MarcDiff.java:60-120``: two id-sorted
    record files walked in step; a record is 'different in file1 and
    file2' on byte inequality, 'found in file1 but not in file2' and
    vice versa on one-sided ids) as one full-outer join.

    Returns one row per key present in either side:
    ``(key, status)`` with status in ``added`` (new only), ``deleted``
    (old only), ``changed`` (both, any value column differs),
    ``unchanged``. The reference walks two sorted files serially; here
    the sort IS the join — a sort-merge full-outer on the key, so the
    diff of two 100 TB snapshots is one co-partitioned shuffle, and
    with both sides bucketed by key, none.

    ``value_cols`` defaults to every shared non-key column;
    null-vs-null counts as equal (the ``<=>`` null-safe comparison).
    """
    from pyspark.sql import functions as F

    if value_cols is None:
        value_cols = [c for c in old.columns
                      if c != key_col and c in new.columns]
    o = old.select(
        F.col(key_col), F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"_o_{c}") for c in value_cols])
    n = new.select(
        F.col(key_col), F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"_n_{c}") for c in value_cols])
    joined = o.join(n, key_col, "full_outer")
    same = F.lit(True)
    for c in value_cols:
        same = same & F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    status = (
        F.when(F.col("_in_old").isNull(), "added")
        .when(F.col("_in_new").isNull(), "deleted")
        .when(same, "unchanged")
        .otherwise("changed")
    )
    return joined.select(key_col, status.alias("status"))
