"""Profiling aggregations — the reference's actual product surface.

The reference's search handler requests ~150 ``facet.field`` entries with
``facet.limit=21, facet.mincount=1`` (``profiling/solr/conf/
solrconfig.xml:85-280``), plus a TermsComponent for sorted term browsing
(``solrconfig.xml:293-304``), numFound counting
(``RemoteSolrSearcher.java:275-327``) and a TermVectorComponent
(``solrconfig.xml:513-524``).

All of these are single-key grouped aggregations / sorted scans — pure
Catalyst territory: partial aggregation bounds shuffles, top-21 is
TakeOrderedAndProject (per-partition heaps, no global sort).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def facet_counts(df: DataFrame, field: str, limit: int = 21,
                 mincount: int = 1, explode_arrays: bool = True) -> DataFrame:
    """Top-``limit`` values of one field by doc count — the flagship
    profiling aggregation (facet.limit=21, facet.mincount=1,
    solrconfig.xml:85-280). Multi-valued (array) fields are exploded first,
    mirroring Solr's per-value faceting of multiValued fields.

    Deterministic output: ties broken by value ascending.
    """
    col = df.schema[field].dataType.typeName() if field in df.columns else None
    work = df
    if explode_arrays and col == "array":
        work = df.select(F.explode_outer(field).alias(field))
    return (
        work.filter(F.col(field).isNotNull())
        .groupBy(field)
        .agg(F.count("*").alias("count"))
        .filter(F.col("count") >= mincount)
        .orderBy(F.desc("count"), F.asc(field))
        .limit(limit)
    )


def facet_multi(df: DataFrame, fields: Sequence[str], limit: int = 21) -> DataFrame:
    """Many facet fields in one pass (the reference sends ~150 per request):
    unpivot via stack() then one grouped agg + per-field rank — one shuffle
    for all fields instead of one scan per field."""
    pairs = ", ".join(f"'{f}', cast({f} as string)" for f in fields)
    stacked = df.selectExpr(
        f"stack({len(fields)}, {pairs}) as (facet_field, facet_value)"
    ).filter(F.col("facet_value").isNotNull())
    counted = stacked.groupBy("facet_field", "facet_value").agg(
        F.count("*").alias("count")
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("facet_field")
        .orderBy(F.desc("count"), F.asc("facet_value"))
    )
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= limit)
        .orderBy("facet_field", "rank")
    )


def num_found(df: DataFrame, predicate) -> int:
    """numFound for an arbitrary predicate (two-phase count of the
    reference collapsed to a single count aggregate)."""
    return df.filter(predicate).count()


def terms_browse(tf_or_tokens: DataFrame, lower_bound: str = "",
                 limit: int = 50, term_col: str = "term") -> DataFrame:
    """Sorted distinct terms from a lower bound (TermsComponent,
    ``terms.lower.incl``, solrconfig.xml:293-304). Served straight from the
    term column — with the physical index this is a metadata-only range scan
    on the sorted term key."""
    return (
        tf_or_tokens.select(term_col)
        .filter(F.col(term_col) >= lower_bound)
        .distinct()
        .orderBy(term_col)
        .limit(limit)
    )


def terms_component(tf: DataFrame, *, key_col: str = "doc_id",
                    term_col: str = "term",
                    lower: str | None = None, lower_incl: bool = True,
                    upper: str | None = None, upper_incl: bool = False,
                    prefix: str | None = None, regex: str | None = None,
                    mincount: int = 1, maxcount: int | None = None,
                    sort: str = "count", limit: int = 10) -> DataFrame:
    """The FULL Solr TermsComponent parameter surface (the component wired
    at solrconfig.xml:294-304; parameters per Solr's TermsComponent:
    terms.lower[.incl], terms.upper[.incl], terms.prefix, terms.regex,
    terms.mincount, terms.maxcount, terms.sort=count|index, terms.limit).

    Input is a (doc, term) frame; output is (term, df) where df is the
    DOCUMENT frequency (Solr returns docFreq per term). ``sort='count'``
    orders by df desc (ties by term asc, Solr's index order);
    ``sort='index'`` by term asc.

    Scale shape: range/prefix/regex predicates apply BEFORE the count
    aggregation, so the shuffle carries only the browsed slice of the
    vocabulary; on the physical index the same predicates are a range
    scan of the sorted dictionary."""
    t = F.col(term_col)
    out = tf.select(key_col, term_col)
    if lower is not None:
        out = out.filter(t >= lower if lower_incl else t > lower)
    if upper is not None:
        out = out.filter(t <= upper if upper_incl else t < upper)
    if prefix is not None:
        out = out.filter(t.startswith(prefix))
    if regex is not None:
        out = out.filter(t.rlike(regex))
    counted = (
        out.distinct()
        .groupBy(term_col)
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= mincount)
    )
    if maxcount is not None:
        counted = counted.filter(F.col("df") <= maxcount)
    if sort == "count":
        counted = counted.orderBy(F.desc("df"), F.asc(term_col))
    elif sort == "index":
        counted = counted.orderBy(F.asc(term_col))
    else:
        raise ValueError("terms.sort must be 'count' or 'index'")
    return counted.limit(int(limit))


def term_vectors(docs_with_tokens: DataFrame, key_col: str = "url",
                 tokens_col: str = "tokens") -> DataFrame:
    """Per-doc (term, tf, first_pos) — TermVectorComponent semantics
    (solrconfig.xml:513-524). Positions are 1-based token positions."""
    pos = docs_with_tokens.select(
        key_col, F.posexplode(tokens_col).alias("pos0", "term")
    )
    return pos.groupBy(key_col, "term").agg(
        F.count("*").cast("int").alias("tf"),
        (F.min("pos0") + 1).cast("int").alias("first_pos"),
    )


def stats_component(df: DataFrame, field: str,
                    facet_field: str | None = None,
                    round_to: int = 4) -> DataFrame:
    """Solr StatsComponent (``stats=true&stats.field=X[&stats.facet=Y]``,
    solrconfig.xml standard components): min / max / count / missing /
    sum / mean / stddev of a numeric field, optionally one row per value
    of a facet field (Solr's stats.facet pivot). ``stddev`` is the
    sample standard deviation (Solr/Lucene's formula); single-row groups
    yield NULL, matching both engines' stddev_samp.

    Scale shape: one partial-aggregatable groupBy (or a global
    single-row aggregate when unfaceted) — every statistic here has a
    map-side combiner, so the shuffle carries one row per facet value.
    """
    aggs = [
        F.round(F.min(field).cast("double"), round_to).alias("min"),
        F.round(F.max(field).cast("double"), round_to).alias("max"),
        F.count(field).cast("long").alias("count"),
        F.sum(F.col(field).isNull().cast("long")).cast("long")
        .alias("missing"),
        F.round(F.sum(field).cast("double"), round_to).alias("sum"),
        F.round(F.avg(field), round_to).alias("mean"),
        F.round(F.stddev_samp(field), round_to).alias("stddev"),
    ]
    if facet_field is None:
        return df.agg(*aggs)
    return df.groupBy(facet_field).agg(*aggs)


def range_facet(df: DataFrame, field: str, start: float, end: float,
                gap: float) -> DataFrame:
    """Solr range faceting (``facet.range=X&facet.range.start/end/gap``):
    count per ``[start + i*gap, start + (i+1)*gap)`` bucket, one row per
    NON-EMPTY bucket keyed by its lower bound (Solr returns empty
    buckets only with mincount=0; this is mincount=1). Values outside
    ``[start, end)`` fall out, Solr's default (no before/after/between
    rows). Pure arithmetic bucketing + one groupBy on the bucket key —
    no window, no sort of the corpus.
    """
    v = F.col(field).cast("double")
    bucket = (F.floor((v - F.lit(float(start))) / F.lit(float(gap)))
              .cast("long"))
    lo = F.lit(float(start)) + bucket.cast("double") * F.lit(float(gap))
    return (
        df.filter(v.isNotNull() & (v >= float(start)) & (v < float(end)))
        .select(lo.alias("bucket_start"))
        .groupBy("bucket_start")
        .agg(F.count("*").cast("long").alias("count"))
    )


def pivot_facet(df: DataFrame, outer: str, inner: str,
                limit: int = 50) -> DataFrame:
    """Solr pivot faceting (``facet.pivot=A,B``): hierarchical counts —
    one row per (outer value, inner value) pair plus the outer total the
    response nests under. Top ``limit`` pairs by (outer_count desc,
    outer asc, count desc, inner asc) — a total order, so the cut is
    deterministic. ONE groupBy on the pair; the outer totals roll up
    from the pair counts (no second corpus pass).
    """
    pairs = (
        df.filter(F.col(outer).isNotNull() & F.col(inner).isNotNull())
        .groupBy(outer, inner).agg(F.count("*").cast("long").alias("count"))
    )
    from pyspark.sql import Window

    outer_tot = Window.partitionBy(outer)
    return (
        pairs.withColumn(
            "outer_count", F.sum("count").over(outer_tot).cast("long"))
        .orderBy(F.desc("outer_count"), F.asc(outer),
                 F.desc("count"), F.asc(inner))
        .limit(limit)
        .select(outer, "outer_count", inner, "count")
    )


def facet_queries(df: DataFrame, preds: "dict[str, object]") -> DataFrame:
    """Solr ``facet.query`` (FacetComponent arbitrary-query facets): one
    count per named predicate, evaluated against the SAME result set in
    ONE pass. Solr answers each facet.query from the cached filter
    bitsets of a single request; the Spark analog is a single aggregate
    with one conditional-count column per predicate (no unions, no
    repeated scans), unpivoted to ``(facet, count)`` rows.

    ``preds`` maps facet labels to Column predicates or SQL strings.
    Zero-match predicates still emit a row (count 0), like Solr.
    """
    if not preds:
        raise ValueError("facet_queries: at least one predicate required")
    aggs = []
    for name, p in preds.items():
        c = F.expr(p) if isinstance(p, str) else p
        aggs.append(
            F.coalesce(F.sum(F.when(c, 1).otherwise(0)), F.lit(0))
            .cast("long").alias(name))
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{n}', `{n}`" for n in preds)  # labels are code-supplied
    return one.select(
        F.expr(f"stack({len(preds)}, {stack_args}) AS (facet, count)"))


def terms_component_phys(index, *, lower: str | None = None,
                         lower_incl: bool = True,
                         upper: str | None = None, upper_incl: bool = False,
                         prefix: str | None = None, regex: str | None = None,
                         mincount: int = 1, maxcount: int | None = None,
                         sort: str = "count", limit: int = 10) -> DataFrame:
    """:func:`terms_component` answered FROM THE PHYSICAL INDEX — how the
    Solr component actually runs (a range scan of the sorted term
    dictionary, never a corpus pass): the same parameter surface becomes
    pure predicates on the committed ``dictionary`` stage, whose parquet
    is term-sorted (``plans/build.py`` commits it ``partition_sort=
    ['term']``), so lower/upper/prefix prune to the browsed row groups
    and df is read, not recomputed. The dictionary is delete-adjusted for
    generation chains, so chain df values match a rebuild."""
    t = F.col("term")
    out = index.dictionary.select("term", "df")
    if lower is not None:
        out = out.filter(t >= lower if lower_incl else t > lower)
    if upper is not None:
        out = out.filter(t <= upper if upper_incl else t < upper)
    if prefix is not None:
        out = out.filter(t.startswith(prefix))
    if regex is not None:
        out = out.filter(t.rlike(regex))
    out = out.filter(F.col("df") >= mincount)
    if maxcount is not None:
        out = out.filter(F.col("df") <= maxcount)
    if sort == "count":
        out = out.orderBy(F.desc("df"), F.asc("term"))
    elif sort == "index":
        out = out.orderBy(F.asc("term"))
    else:
        raise ValueError("terms.sort must be 'count' or 'index'")
    return out.limit(int(limit))
