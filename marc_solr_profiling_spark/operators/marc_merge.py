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
