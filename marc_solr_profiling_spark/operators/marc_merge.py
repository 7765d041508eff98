"""Record-combining and holdings-merge operators (SURVEY.md §2.5) over
MARC-shaped rows (operators/fieldspec.MARC_SCHEMA + an input sequence
number for order).

The reference implements these as pull-based stream decorators over sorted
files; here they are one grouped aggregation each — order is preserved via
an explicit ``seq`` column (the DataFrame restatement of "consecutive in
the input stream"), and all array surgery is native (collect_list +
sort_array + flatten/filter), no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# MHLD fields that carry summary holdings and REPLACE clashing bib fields
# (CombineMultBibsMhldsReader defaults, core/src/org/solrmarc/marc/
# CombineMultBibsMhldsReader.java:56-63; MergeSummaryHoldings uses the same
# set, core/src/org/solrmarc/tools/MergeSummaryHoldings.java:30-35)
MHLD_FLDS_RE = "^(852|853|863|866|867|868)$"


def combine_records(df: DataFrame, field_regex: str = "^999$",
                    id_col: str = "record_id",
                    seq_col: str = "seq") -> DataFrame:
    """``MarcCombiningReader`` (core/src/org/solrmarc/marc/
    MarcCombiningReader.java:25-130; config ``marc.combine_records``,
    profiling/prof_config.properties:38): merge same-id records — the first
    (by input order) is the base, and from every subsequent record the
    fields matching ``field_regex`` are appended in order. The reference's
    use case is oversized records split into continuations carrying extra
    999 item fields.
    """
    packed = F.struct(
        F.col(seq_col).alias("seq"),
        F.col("leader").alias("leader"),
        F.col("controlfields").alias("controlfields"),
        F.col("datafields").alias("datafields"),
    )
    grouped = df.groupBy(id_col).agg(
        F.sort_array(F.collect_list(packed)).alias("recs")
    )
    base = F.element_at(F.col("recs"), 1)
    extra = F.flatten(
        F.transform(
            F.slice(F.col("recs"), 2, F.greatest(F.size("recs") - 1, F.lit(0))),
            lambda r: F.filter(
                r["datafields"], lambda f: f["tag"].rlike(field_regex)
            ),
        )
    )
    return grouped.select(
        F.col(id_col),
        base["leader"].alias("leader"),
        base["controlfields"].alias("controlfields"),
        F.concat(base["datafields"], extra).alias("datafields"),
    )


def merge_summary_holdings(bib: DataFrame, mhld: DataFrame,
                           id_col: str = "record_id") -> DataFrame:
    """``MergeSummaryHoldings`` (MergeSummaryHoldings.java:30-35, 226,
    290-305): left-outer merge of a bib table with an MHLD table on record
    id — every bib survives; where an MHLD matches, its holdings fields
    (852/853/863/866/867/868) REPLACE clashing bib fields and are inserted
    BEFORE the bib's 999 item fields (the CombineMultBibsMhldsReader
    precedence rule, CombineMultBibsMhldsReader.java:11-61).

    The reference exploits both files being pre-sorted by id to stream the
    merge; Spark's sort-merge join reconstructs exactly that plan shape
    (repartitionByRange + SMJ) without assuming pre-sortedness.
    """
    mhld_fields = mhld.select(
        F.col(id_col),
        F.filter(
            F.col("datafields"), lambda f: f["tag"].rlike(MHLD_FLDS_RE)
        ).alias("_mhld_fields"),
    )
    joined = bib.join(mhld_fields, id_col, "left_outer")
    mh = F.coalesce(F.col("_mhld_fields"), F.array().cast(
        bib.schema["datafields"].dataType
    ))
    non999 = F.filter(
        F.col("datafields"),
        lambda f: (f["tag"] != "999") & ~f["tag"].rlike(MHLD_FLDS_RE),
    )
    item999 = F.filter(F.col("datafields"), lambda f: f["tag"] == "999")
    return joined.select(
        *[c for c in bib.columns if c != "datafields"],
        F.concat(non999, mh, item999).alias("datafields"),
    )


def apply_delete_list(df: DataFrame, deletes: DataFrame,
                      id_col: str = "record_id") -> DataFrame:
    """``.del``-file application (MarcImporter.deleteRecords,
    core/src/org/solrmarc/marc/MarcImporter.java:348-416): left-anti
    semi-join — DELETE FROM records WHERE id IN (SELECT id FROM dels)."""
    return df.join(deletes.select(id_col), id_col, "left_anti")


def natural_sort_records(df: DataFrame, id_col: str = "record_id") -> DataFrame:
    """``MarcSorter`` (core/src/org/solrmarc/marc/MarcSorter.java:17-84):
    whole-corpus sort by id under number-aware natural order
    (StringNaturalCompare.java:1-152, u99 < u100) — via the zero-padded
    sort-key column (functions/cleaning.natural_sort_key_udf)."""
    from ..functions.cleaning import natural_sort_key_udf

    return (
        df.withColumn("_nk", natural_sort_key_udf()(F.col(id_col)))
        .orderBy("_nk")
        .drop("_nk")
    )


def patch_locations(records: DataFrame, locations: DataFrame,
                    id_col: str = "record_id") -> DataFrame:
    """``MarcPatcher`` (core/src/org/solrmarc/marc/MarcPatcher.java:46-60,
    375-460): join records against a location-change file
    ``(record_id, barcode, current_loc, home_loc)`` and patch matching 999
    item fields — the item is matched by barcode ($i); its home location
    ($l) is set to ``home_loc``; a current-location $k is present iff
    ``current_loc != home_loc``. Adds a ``changed`` flag so the
    changed-records output stream (MarcPatcher's writerChanged) is a
    filter away.

    Plan shape: the location file is aggregated to one array per record id
    and joined on the id — AQE broadcasts the (bounded, file-sized) side
    when it measures small, a shuffled join otherwise (no forced hint);
    the 999 surgery itself is a pure array transform, no Python.
    """
    patches = locations.groupBy(id_col).agg(
        F.collect_list(
            F.struct(
                F.col("barcode"), F.col("current_loc"), F.col("home_loc")
            )
        ).alias("_patches")
    )
    joined = records.join(patches, id_col, "left")

    def patched_field(f):
        barcode = F.try_element_at(
            F.filter(f["subfields"], lambda s: s["code"] == "i"), F.lit(1)
        )["value"]
        match = F.try_element_at(
            F.filter(
                F.col("_patches"), lambda p: p["barcode"] == barcode
            ),
            F.lit(1),
        )
        without_k = F.filter(f["subfields"], lambda s: s["code"] != "k")
        relocated = F.transform(
            without_k,
            lambda s: F.when(
                s["code"] == "l",
                F.struct(
                    s["code"].alias("code"),
                    match["home_loc"].alias("value"),
                ),
            ).otherwise(s),
        )
        with_k = F.when(
            match["current_loc"] != match["home_loc"],
            F.flatten(
                F.array(
                    F.filter(relocated, lambda s: s["code"] < "l"),
                    F.array(
                        F.struct(
                            F.lit("k").alias("code"),
                            match["current_loc"].alias("value"),
                        )
                    ),
                    F.filter(relocated, lambda s: s["code"] >= "l"),
                )
            ),
        ).otherwise(relocated)
        return F.when(
            (f["tag"] == "999") & match.isNotNull() & barcode.isNotNull(),
            F.struct(
                f["tag"].alias("tag"),
                f["ind1"].alias("ind1"),
                f["ind2"].alias("ind2"),
                with_k.alias("subfields"),
            ),
        ).otherwise(f)

    has_patches = F.col("_patches").isNotNull()
    new_fields = F.when(
        has_patches, F.transform(F.col("datafields"), patched_field)
    ).otherwise(F.col("datafields"))
    out = joined.withColumn("_new_datafields", new_fields)
    return (
        out.withColumn(
            "changed",
            has_patches
            & (
                F.to_json(F.col("_new_datafields"))
                != F.to_json(F.col("datafields"))
            ),
        )
        .withColumn("datafields", F.col("_new_datafields"))
        .drop("_patches", "_new_datafields")
    )


def booklist_enrich(docs: DataFrame, booklist: DataFrame,
                    id_col: str = "record_id") -> DataFrame:
    """``BooklistReader`` point-lookup enrich (core/src/org/solrmarc/marc/
    BooklistReader.java:24-60): for each id in a small delimited booklist
    side-input, look the doc up and augment it with the booklist's extra
    columns (e.g. fund_code); docs not on the list pass through with
    nulls, plus an ``on_booklist`` flag. Left join on the id — the
    booklist is a file-sized side input, so AQE broadcasts it."""
    marked = booklist.withColumn("on_booklist", F.lit(True))
    out = docs.join(marked, id_col, "left")
    return out.withColumn(
        "on_booklist", F.coalesce(F.col("on_booklist"), F.lit(False))
    )


def combine_mult_bibs_mhlds(
    df: DataFrame,
    bib_fld_regex: str = "^999$",
    mhld_fld_regex: str = MHLD_FLDS_RE,
    id_col: str = "record_id",
    seq_col: str = "seq",
    path_col: str = "path",
) -> DataFrame:
    """``CombineMultBibsMhldsReader`` (CombineMultBibsMhldsReader.java:
    11-61): a Sirsi dump file is runs of ``bib+ mhld*`` per id
    (e.g. bib1 bib2 mhld2 mhld2 bib3 ...). Per run: the first bib is the
    base; later bibs contribute only their ``bib_fld_regex`` (999 item)
    fields; mhld records contribute their holdings fields, which REPLACE
    clashing bib fields and are inserted before the 999s.

    Error conditions (the reference reports-and-continues / dies):
      - an mhld first in file, or following a different id -> the row is
        emitted UN-combined with ``combine_error`` = 'mhld out of order'
      - a bib following an mhld of the SAME id (upstream dump corruption,
        fatal in the reference) -> ``combine_error`` = 'bib follows mhld'
    Clean outputs carry ``combine_error`` = NULL (quarantine discipline,
    MarcImporter.java:202-257).

    Plan shape: one per-file window pass (lag) to classify rows + assign
    run ids (files are the reference's own parallelism unit, so the
    window partitions by ``path``), then one grouped aggregation per run.
    """
    from pyspark.sql import Window

    from ..functions.domain import is_mhld_expr

    w = Window.partitionBy(path_col).orderBy(seq_col)
    classified = (
        df.withColumn("_is_mhld", is_mhld_expr("leader"))
        .withColumn("_prev_id", F.lag(id_col).over(w))
        .withColumn("_prev_mhld", F.lag("_is_mhld").over(w))
    )
    err = (
        F.when(
            F.col("_is_mhld")
            & (F.col("_prev_id").isNull()
               | (F.col("_prev_id") != F.col(id_col))),
            "mhld out of order",
        )
        .when(
            (~F.col("_is_mhld"))
            & F.coalesce(F.col("_prev_mhld"), F.lit(False))
            & (F.col("_prev_id") == F.col(id_col)),
            "bib follows mhld",
        )
    )
    classified = classified.withColumn("_err", err)
    errors = classified.filter(F.col("_err").isNotNull()).select(
        path_col, id_col, "leader", "controlfields", "datafields",
        F.col("_err").alias("combine_error"),
    )
    valid = classified.filter(F.col("_err").isNull())
    run_start = (
        (~F.col("_is_mhld"))
        & (F.col("_prev_id").isNull()
           | (F.col("_prev_id") != F.col(id_col)))
    ).cast("int")
    valid = valid.withColumn(
        "_run",
        F.sum(run_start).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    packed = F.struct(
        F.col(seq_col).alias("seq"),
        F.col("_is_mhld").alias("is_mhld"),
        F.col(id_col).alias("rid"),
        F.col("leader").alias("leader"),
        F.col("controlfields").alias("controlfields"),
        F.col("datafields").alias("datafields"),
    )
    grouped = valid.groupBy(path_col, "_run").agg(
        F.sort_array(F.collect_list(packed)).alias("recs")
    )
    base = F.element_at(F.col("recs"), 1)
    rest = F.slice(
        F.col("recs"), 2, F.greatest(F.size("recs") - 1, F.lit(0))
    )
    extra_999 = F.flatten(
        F.transform(
            F.filter(rest, lambda r: ~r["is_mhld"]),
            lambda r: F.filter(
                r["datafields"], lambda f: f["tag"].rlike(bib_fld_regex)
            ),
        )
    )
    mhld_fields = F.flatten(
        F.transform(
            F.filter(rest, lambda r: r["is_mhld"]),
            lambda r: F.filter(
                r["datafields"], lambda f: f["tag"].rlike(mhld_fld_regex)
            ),
        )
    )
    has_mhld = F.size(mhld_fields) > 0
    base_non999 = F.filter(
        base["datafields"],
        lambda f: ~f["tag"].rlike(bib_fld_regex),
    )
    base_keep = F.when(
        has_mhld,
        F.filter(base_non999, lambda f: ~f["tag"].rlike(mhld_fld_regex)),
    ).otherwise(base_non999)
    base_999 = F.filter(
        base["datafields"], lambda f: f["tag"].rlike(bib_fld_regex)
    )
    combined = grouped.select(
        F.col(path_col),
        base["rid"].alias(id_col),
        base["leader"].alias("leader"),
        base["controlfields"].alias("controlfields"),
        F.concat(base_keep, mhld_fields, base_999, extra_999).alias(
            "datafields"
        ),
        F.lit(None).cast("string").alias("combine_error"),
    )
    return combined.unionByName(errors)
