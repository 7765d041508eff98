"""BM25 top-k scoring over the logical index (DataFrame path).

Re-expresses the reference's relevance query
(``profiling/solr/conf/solrconfig.xml:64-83``: edismax, ``sort=score desc``,
``rows=20`` top-k) as a broadcast-join scoring plan. BM25 parameters are the
north-rule's k1=1.2, b=0.75, Lucene idf form:

    idf(t)  = ln((N - df + 0.5) / (df + 0.5) + 1)
    s(t, d) = idf * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))

Plan shape (and why it scales):
- query terms (a handful) are broadcast — the posting scan is a broadcast
  hash semi-join, so only matching postings survive the scan; with the
  physical index (segments.py) the term predicate additionally prunes
  parquet row groups via min/max on the sorted ``term`` column.
- per-term scores are summed by doc: one shuffle keyed on doc, bounded by
  the matching postings (≪ corpus).
- top-k = TakeOrderedAndProject (per-partition heaps + driver merge of k
  rows per partition — Spark's physical operator for orderBy+limit), NOT a
  global sort.

Determinism: scores are float64; ranking ties are broken by doc key
ascending (the reference breaks score ties by internal docid). For
cross-engine comparisons scores are rounded to 6 decimals before ranking.
"""

from __future__ import annotations

import math
from typing import List, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.analyzer import ANALYZERS
from ..functions.mm_spec import parse_mm_spec
from ..oracle import K1, B, bm25_idf


def query_term_weights(
    spark: SparkSession,
    query: str,
    df_map: dict[str, int],
    n_docs: int,
    chain: str = "text",
) -> List[tuple[str, float]]:
    """Tokenize a query with the SAME chain as the index and attach idf.
    Duplicate query terms collapse to one (summed once, like the oracle)."""
    terms: List[str] = []
    for t in ANALYZERS[chain](query):
        if t not in terms:
            terms.append(t)
    return [(t, bm25_idf(n_docs, df_map.get(t, 0))) for t in terms if t in df_map]


def bm25_topk(
    tf: DataFrame,
    doc_stats: DataFrame,
    n_docs: int,
    avgdl: float,
    query_terms_idf: Sequence[tuple[str, float]],
    key_col: str = "url",
    k: int = 10,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Top-k docs for one query. Returns (key, score) ordered by
    (score desc, key asc), k rows.

    ``query_terms_idf``: [(term, idf)] from :func:`query_term_weights`.
    """
    spark = tf.sparkSession
    if not query_terms_idf:
        return (
            tf.select(key_col).limit(0)
            .withColumn("score", F.lit(0.0))
        )
    qdf = spark.createDataFrame(
        list(query_terms_idf), schema="term string, idf double"
    )
    matched = tf.join(F.broadcast(qdf), "term")  # semi-scan of postings
    scored = (
        matched.join(doc_stats, key_col)
        .withColumn(
            "term_score",
            F.col("idf")
            * F.col("tf")
            * F.lit(k1 + 1.0)
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("doc_len") / F.lit(avgdl))
            ),
        )
        .groupBy(key_col)
        .agg(F.sum("term_score").alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc(key_col)).limit(k)


def phrase_match_expr(
    tokens_col: str, phrase_terms: Sequence[str], slop: int = 0
):
    """Positional phrase predicate — Lucene ``PhraseQuery``, the capability
    behind the reference's edismax phrase parameters
    (``solrconfig.xml:68-82`` ``qs=1, ps=0``).

    ``slop=0``: exact adjacency (``tokens[i..i+m-1] == phrase_terms``).
    ``slop>0``: ordered sloppy match — positions ``p1 < ... < pm`` with
    ``tokens[pj] == terms[j]`` and ``pm - p1 <= (m-1) + slop``. This is
    Lucene's sloppy-phrase semantics restricted to in-order matches
    (a transposition costs Lucene >= 2 moves, so for the reference's
    ``qs=1`` the in-order subset is exact parity).

    Scale shape: a pure per-row native expression (``exists`` over a
    position sequence, nested per phrase term for the sloppy form) —
    zero Python, zero shuffle, runs inside whole-stage codegen next to
    the token scan, and Catalyst short-circuits the conjunction per
    position. The physical-index evolution of this is a varbyte position
    list per posting (Lucene's .pos file, ``operators/phrase.py``).
    """
    m = len(phrase_terms)
    if m == 0:
        return F.lit(False)
    if slop < 0:
        raise ValueError("slop must be >= 0")
    for t in phrase_terms:
        # strict: terms are interpolated into single-quoted SQL literals,
        # so anything beyond alphanumerics (apostrophes included) is
        # rejected rather than escaped — every analyzer chain here emits
        # alnum-only tokens, so a non-alnum "term" is a caller bug
        if not t.isalnum():
            raise ValueError(f"phrase term {t!r} not analyzer-clean")
    if slop == 0:
        conds = " AND ".join(
            f"element_at({tokens_col}, CAST(i + {j} AS INT)) = '{t}'"
            for j, t in enumerate(phrase_terms)
        )
        # guard: sequence(1, n) with n < 1 would produce a DESCENDING
        # [1..n] sequence (and element_at(_, 0) raises), so short docs
        # return false before the exists is evaluated
        inner = (
            f"exists(sequence(1, size({tokens_col}) - {m - 1}),"
            f" i -> {conds})"
        )
        return F.when(
            F.size(F.col(tokens_col)) >= m, F.expr(inner)
        ).otherwise(F.lit(False))

    # sloppy form: nested exists, one level per remaining term, all
    # bounded by the shared window end hi = p1 + (m-1) + slop
    n = f"size({tokens_col})"
    hi = f"least(p0 + {m - 1 + slop}, {n})"

    def step(j: int, prev: str) -> str:
        var = f"p{j}"
        cond = (
            f"element_at({tokens_col}, CAST({var} AS INT))"
            f" = '{phrase_terms[j]}'"
        )
        nxt = step(j + 1, var) if j + 1 < m else "true"
        # CASE guard: sequence(a, b) with a > b is DESCENDING, not empty
        return (
            f"(CASE WHEN {prev} + 1 <= {hi} THEN "
            f"exists(sequence({prev} + 1, {hi}),"
            f" {var} -> {cond} AND {nxt}) ELSE false END)"
        )

    first = f"element_at({tokens_col}, CAST(p0 AS INT)) = '{phrase_terms[0]}'"
    inner = (
        f"exists(sequence(1, {n} - {m - 1}),"
        f" p0 -> {first} AND {step(1, 'p0')})"
    )
    return F.when(
        F.size(F.col(tokens_col)) >= m, F.expr(inner)
    ).otherwise(F.lit(False))


def bm25_dismax_topk_plan(
    docs: DataFrame,
    query: str,
    fields: Sequence[tuple],
    key_col: str = "doc_id",
    k: int = 10,
    chain: str = "simple",
    k1: float = K1,
    b: float = B,
    tie: float = 0.1,
    round_to: int = 4,
    min_match: int | str | None = None,
    return_all_scored: bool = False,
    filter_query=None,
) -> DataFrame:
    """Edismax dismax scoring over multiple fields — the reference's actual
    query handler (``solrconfig.xml:64-83``: edismax with ``qf`` per-field
    boosts and a tie-breaker): per query term, each field is scored
    independently with ITS OWN collection stats (per-field df and avgdl,
    exactly as Lucene computes norms/idf per field), the term's score is
    ``max_f + tie * (sum_f - max_f)`` over the fields
    (DisjunctionMaxQuery), and the doc score sums the per-term dismaxes.

    ``fields``: sequence of ``(tokens_expr_or_col, boost)`` — each entry a
    column/expression yielding the field's token array for a doc.

    Scale shape: one tokenize pass per field over the SAME scan (Catalyst
    collapses the projections), per-field partial-agg tf, a union of
    compact (key, term, weighted score) rows, two groupBys on (key, term)
    then (key) — all JVM-side, broadcast-joined query terms, ending in
    TakeOrderedAndProject.
    """
    spark = docs.sparkSession
    qterms: list[str] = []
    for t in ANALYZERS[chain](query):
        if t not in qterms:
            qterms.append(t)
    if not qterms:
        return spark.createDataFrame([], f"{key_col} long, score double")
    per_term = _dismax_per_term(
        docs, qterms, fields, key_col=key_col, k1=k1, b=b, tie=tie
    )
    # edismax mm over BASE terms: a term matched in any field counts once
    # (the per_term rows are already one per (doc, base term))
    scored = per_term.groupBy(key_col).agg(
        F.round(F.sum("ds"), round_to).alias("score"),
        F.count("*").alias("_n_matched"),
    )
    if min_match is not None:
        scored = scored.filter(
            F.col("_n_matched") >= parse_mm_spec(min_match, len(qterms))
        )
    if filter_query is not None:
        # Solr cached-filter fq: restricts the match set WITHOUT touching
        # scores (stats stay collection-wide) — a semi-join against the
        # fq-surviving keys
        pred = (F.expr(filter_query) if isinstance(filter_query, str)
                else filter_query)
        scored = scored.join(
            docs.filter(pred).select(key_col), key_col, "left_semi")
    if return_all_scored:
        # the /select composition shares ONE scored match set between
        # numFound, the page and the facet domain (plans/select.py)
        return scored.select(key_col, "score")
    return (
        scored.select(key_col, "score")
        .orderBy(F.desc("score"), F.asc(key_col))
        .limit(int(k))
    )


def _dismax_per_term(
    docs: DataFrame,
    qterms: Sequence[str],
    fields: Sequence[tuple],
    key_col: str = "doc_id",
    k1: float = K1,
    b: float = B,
    tie: float = 0.1,
) -> DataFrame:
    """Per-(doc, term) dismax scores over the qf fields — the shared core
    of the plain and pf-boosted edismax plans. Returns (key, term, ds)."""
    from .postings import term_freqs

    spark = docs.sparkSession
    qdf = spark.createDataFrame([(t,) for t in qterms], "term string")

    parts = []
    for fi, (tokens_col, boost) in enumerate(fields):
        toks = docs.select(
            F.col(key_col),
            (F.col(tokens_col) if isinstance(tokens_col, str)
             else tokens_col).alias("tokens"),
        )
        with_dl = toks.select(
            key_col, "tokens", F.size("tokens").alias("dl")
        )
        stats = with_dl.agg(
            F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
        )
        tf = term_freqs(
            with_dl.select(key_col, "tokens"), key_col=key_col
        ).join(F.broadcast(qdf), "term")
        dfq = tf.groupBy("term").agg(F.count("*").alias("df"))
        scored = (
            tf.join(F.broadcast(dfq), "term")
            .join(with_dl.select(key_col, "dl"), key_col)
            .crossJoin(F.broadcast(stats))
            .select(
                key_col,
                "term",
                (
                    F.lit(float(boost))
                    * F.log(
                        (F.col("n_docs") - F.col("df") + 0.5)
                        / (F.col("df") + 0.5) + 1.0
                    )
                    * F.col("tf") * (k1 + 1.0)
                    / (
                        F.col("tf")
                        + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                    )
                ).alias("s"),
            )
        )
        parts.append(scored)
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy(key_col, "term")
        .agg(F.max("s").alias("mx"), F.sum("s").alias("sm"))
        .select(
            key_col,
            "term",
            (F.col("mx") + float(tie) * (F.col("sm") - F.col("mx")))
            .alias("ds"),
        )
    )


def phrase_freq_expr(
    tokens_col: str, phrase_terms: Sequence[str], slop: int = 0
):
    """Phrase FREQUENCY — the number of match start positions, i.e. the
    ``tf`` a Lucene ``PhraseQuery`` feeds its similarity (the scoring
    side of :func:`phrase_match_expr`'s boolean).

    ``slop=0``: count of exact adjacencies; ``slop>0``: count of start
    positions from which an in-order sloppy match (window ``(m-1)+slop``)
    exists. Same native-expression scale shape as phrase_match_expr:
    ``size(filter(sequence(...)))`` inside whole-stage codegen.
    """
    m = len(phrase_terms)
    if m == 0:
        return F.lit(0)
    if slop < 0:
        raise ValueError("slop must be >= 0")
    for t in phrase_terms:
        if not t.isalnum():
            raise ValueError(f"phrase term {t!r} not analyzer-clean")
    n = f"size({tokens_col})"
    if slop == 0:
        conds = " AND ".join(
            f"element_at({tokens_col}, CAST(i + {j} AS INT)) = '{t}'"
            for j, t in enumerate(phrase_terms)
        )
        inner = (
            f"size(filter(sequence(1, {n} - {m - 1}), i -> {conds}))"
        )
    else:
        hi = f"least(p0 + {m - 1 + slop}, {n})"

        def step(j: int, prev: str) -> str:
            var = f"p{j}"
            cond = (
                f"element_at({tokens_col}, CAST({var} AS INT))"
                f" = '{phrase_terms[j]}'"
            )
            nxt = step(j + 1, var) if j + 1 < m else "true"
            return (
                f"(CASE WHEN {prev} + 1 <= {hi} THEN "
                f"exists(sequence({prev} + 1, {hi}),"
                f" {var} -> {cond} AND {nxt}) ELSE false END)"
            )

        first = (
            f"element_at({tokens_col}, CAST(p0 AS INT))"
            f" = '{phrase_terms[0]}'"
        )
        inner = (
            f"size(filter(sequence(1, {n} - {m - 1}),"
            f" p0 -> {first} AND {step(1, 'p0')}))"
        )
    return F.when(
        F.size(F.col(tokens_col)) >= m, F.expr(inner).cast("int")
    ).otherwise(F.lit(0))


def bm25_dismax_pf_plan(
    docs: DataFrame,
    query: str,
    qf_fields: Sequence[tuple],
    pf_fields: Sequence[tuple],
    key_col: str = "doc_id",
    k: int = 10,
    chain: str = "simple",
    ps: int = 0,
    k1: float = K1,
    b: float = B,
    tie: float = 0.1,
    round_to: int = 4,
) -> DataFrame:
    """Edismax with PHRASE-BOOST fields — the reference's ``pf``/``ps``
    handler shape (test/solr/conf/solrconfig.xml:251-368 ``pf_author`` /
    ``pf_title`` boosts with ``ps=3``; Solr's DisMaxQParser adds the pf
    phrase queries as SHOULD clauses on top of the main dismax query).

    Scoring: the main score is the qf dismax sum (``_dismax_per_term``);
    each pf field contributes, for docs where the FULL analyzed query
    occurs as a phrase within ``ps`` slop,

        boost * idf_sum * ptf*(k1+1) / (ptf + k1*(1-b+b*dl/avgdl))

    with ``ptf`` the phrase frequency (:func:`phrase_freq_expr`) and
    ``idf_sum`` the sum of the phrase terms' idfs in that field — Lucene's
    PhraseQuery similarity (sum-of-idfs, phrase freq as tf). Multiple pf
    fields combine as a DisjunctionMax with the same ``tie``; the phrase
    part is ADDED to the main score (a pure boost: docs are selected by
    the main query only).

    Scale shape: the phrase counter is a native per-row expression next to
    the token scan (no shuffle); per-field idf_sum and stats are scalar
    aggregates broadcast back; the final combine is one left join of the
    (small) per-doc phrase-boost frame onto the main scores.
    """
    spark = docs.sparkSession
    qterms: list[str] = []
    for t in ANALYZERS[chain](query):
        if t not in qterms:
            qterms.append(t)
    if not qterms:
        return spark.createDataFrame([], f"{key_col} long, score double")
    per_term = _dismax_per_term(
        docs, qterms, qf_fields, key_col=key_col, k1=k1, b=b, tie=tie
    )
    main = per_term.groupBy(key_col).agg(F.sum("ds").alias("main"))

    from .postings import term_freqs

    qdf = spark.createDataFrame([(t,) for t in qterms], "term string")
    pf_parts = []
    for tokens_col, boost in pf_fields:
        toks = docs.select(
            F.col(key_col),
            (F.col(tokens_col) if isinstance(tokens_col, str)
             else tokens_col).alias("tokens"),
        )
        with_dl = toks.select(
            key_col, "tokens", F.size("tokens").alias("dl")
        )
        stats = with_dl.agg(
            F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
        )
        dfq = (
            term_freqs(with_dl.select(key_col, "tokens"), key_col=key_col)
            .join(F.broadcast(qdf), "term")
            .groupBy("term")
            .agg(F.count("*").alias("df"))
        )
        idf_sum = (
            dfq.crossJoin(F.broadcast(stats))
            .agg(
                F.sum(
                    F.log(
                        (F.col("n_docs") - F.col("df") + 0.5)
                        / (F.col("df") + 0.5) + 1.0
                    )
                ).alias("idf_sum")
            )
        )
        ph = with_dl.select(
            key_col,
            "dl",
            phrase_freq_expr("tokens", qterms, slop=ps).alias("ptf"),
        ).filter(F.col("ptf") > 0)
        pf_parts.append(
            ph.crossJoin(F.broadcast(stats))
            .crossJoin(F.broadcast(idf_sum))
            .select(
                key_col,
                (
                    F.lit(float(boost)) * F.col("idf_sum")
                    * F.col("ptf") * (k1 + 1.0)
                    / (
                        F.col("ptf")
                        + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                    )
                ).alias("s"),
            )
        )
    pu = pf_parts[0]
    for p in pf_parts[1:]:
        pu = pu.unionByName(p)
    pboost = pu.groupBy(key_col).agg(
        (F.max("s") + float(tie) * (F.sum("s") - F.max("s"))).alias("pb")
    )
    return (
        main.join(pboost, key_col, "left")
        .select(
            key_col,
            F.round(
                F.col("main") + F.coalesce(F.col("pb"), F.lit(0.0)),
                round_to,
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(key_col))
        .limit(int(k))
    )


def bm25_topk_sql_plan(
    docs: DataFrame,
    query: str,
    key_col: str = "doc_id",
    k: int = 10,
    chain: str = "simple",
    k1: float = K1,
    b: float = B,
    round_to: int = 4,
    min_match: int | str | None = None,
    phrase: str | None = None,
    phrase_slop: int = 0,
    filter_query=None,
    exclude_query: str | None = None,
    require_query: str | None = None,
    wildcard: "str | list[str] | None" = None,
    term_range: "tuple[str, str] | None" = None,
    boost_query: str | None = None,
    boost_weight: float = 1.0,
    boost_function=None,
    boost=None,
    term_boosts: "dict[str, float] | None" = None,
    return_all_scored: bool = False,
) -> DataFrame:
    """Self-contained single-DataFrame BM25 top-k over a raw docs table —
    the oracle-checkable form (entire plan is Catalyst-visible; collection
    stats computed via broadcast-joined single-row aggregates, never
    collected to the driver).

    Query tokenization uses the same chain as the docs. Ties after rounding
    break by key ascending.

    ``min_match`` is the edismax minimum-should-match analog
    (``solrconfig.xml:68`` ``mm=6<-1 6<90%``; default ``q.op=AND``
    ``solrconfig.xml:76``): a doc must match at least ``min_match`` distinct
    query terms to score. ``min_match=len(terms)`` is pure conjunction (the
    reference's AND default); ``None`` is pure disjunction. The gate is a
    HAVING on the per-doc score aggregation — matched postings are already
    grouped by doc there, so it adds no extra shuffle.

    ``phrase``: restrict results to docs where the analyzed phrase occurs
    as an exact token adjacency (:func:`phrase_match_expr`); scoring and
    collection stats stay CORPUS-wide (Lucene scores a phrase-filtered
    query with global idf/avgdl, not stats of the filtered subset).

    ``filter_query``: the Solr ``fq`` parameter — a Column predicate (or
    SQL string) over the ORIGINAL docs columns that restricts the result
    set WITHOUT touching scores: idf/avgdl/doc stats remain
    collection-wide, exactly Solr's cached-filter intersection
    semantics. Applied as a key semi-join of the passing docs against
    the scored frame (AQE broadcasts when the filter is selective).

    ``exclude_query``: prohibited clauses — the Lucene query parser's
    ``-term`` / ``NOT term`` syntax (``BooleanClause.Occur.MUST_NOT``;
    edismax passes ``-``-prefixed words through as prohibited clauses).
    Docs containing ANY excluded term are removed; the surviving docs'
    scores are untouched (MUST_NOT clauses never score). Applied as a
    key anti-join against the doc set of the excluded postings — the
    exclusion never rescans the corpus text.

    ``require_query``: required clauses — the parser's ``+term`` syntax
    (``BooleanClause.Occur.MUST``). Required terms SCORE like any other
    clause (they join the query term set), but a doc must match ALL of
    them to appear; terms of the main ``query`` stay optional SHOULD
    clauses. The gate is a conditional count on the same per-doc
    aggregation as ``min_match`` — no extra shuffle.

    ``wildcard``: a trailing-``*`` prefix clause (``SolrQueryParser``
    wildcard term). Lucene rewrites multi-term queries with
    ``MultiTermQuery.CONSTANT_SCORE_REWRITE`` by default: every doc
    containing at least one term matching the prefix gets a CONSTANT
    1.0 contribution (not per-expanded-term BM25), OR-combined with the
    scored term clauses — a doc may match only the wildcard. The
    expansion is a predicate on the postings' term column (prefix range
    scan on the sorted term dictionary in the physical index), never an
    enumeration collected to the driver. ``min_match`` gates the scored
    term clauses only.

    ``term_range``: a ``[lo TO hi]`` TermRangeQuery (inclusive), the
    other MultiTermQuery family member — same CONSTANT_SCORE_REWRITE
    semantics as ``wildcard``: +1.0 per doc holding any term in the
    range, OR-combined.

    ``boost_query`` (+ ``boost_weight``): the edismax ``bq`` parameter —
    an additional query BM25-scored over the same collection stats
    whose weighted score ADDS to docs matching the main query. Docs
    matching only ``bq`` do not appear (in edismax the main query is
    the mandatory clause, bq an optional one): a key left join, never
    a corpus-widening union.

    ``boost_function``: the edismax ``bf`` parameter — a Column over
    the ORIGINAL docs columns (e.g. a recency ``recip`` analog) added
    to the score of every result. ``boost``: edismax's multiplicative
    ``boost`` parameter — a Column the final score is multiplied by.
    Application order matches edismax: (main + bq + bf) * boost.

    ``term_boosts``: per-clause boosts — the query parser's ``term^2``
    syntax (``SolrQueryParser`` / ``QueryParserBase.getBoost``; Lucene
    multiplies the clause's score contribution by the boost). Keys are
    raw surface forms, analyzed with the same ``chain`` before lookup;
    unlisted terms keep weight 1.0. A boosted term absent from
    ``query`` is NOT added to the clause set (boosting is a modifier,
    not a clause).
    """
    from .postings import (collection_stats, doc_stats as _doc_stats,
                           term_freqs, with_tokens)

    spark = docs.sparkSession
    qterms: List[str] = []
    for t in ANALYZERS[chain](query):
        if t not in qterms:
            qterms.append(t)
    req_terms: List[str] = []
    if require_query is not None:
        for t in ANALYZERS[chain](require_query):
            if t not in req_terms:
                req_terms.append(t)
        for t in req_terms:
            if t not in qterms:
                qterms.append(t)
    if not qterms and wildcard is None and term_range is None:
        return docs.select(key_col).limit(0).withColumn("score", F.lit(0.0))

    toks = with_tokens(docs, chain=chain)
    tf = term_freqs(toks, key_col=key_col)
    ds = _doc_stats(toks, key_col=key_col)
    cs = collection_stats(ds)  # 1 row: n_docs, avgdl

    boosts: dict = {}
    if term_boosts:
        for raw, w in term_boosts.items():
            for t in ANALYZERS[chain](raw):
                boosts[t] = float(w)
    qdf = spark.createDataFrame(
        [(t, boosts.get(t, 1.0)) for t in qterms],
        schema="term string, qboost double",
    )
    dfreq = (
        tf.join(F.broadcast(qdf.select("term")), "term")
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    matched = (
        tf.join(F.broadcast(qdf), "term")
        .join(F.broadcast(dfreq), "term")
        .join(ds, key_col)
        .crossJoin(F.broadcast(cs))
    )
    score_expr = (
        F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
        * F.col("tf") * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("doc_len") / F.col("avgdl"))
        )
    )
    scored = (
        matched.withColumn("term_score", score_expr * F.col("qboost"))
        .groupBy(key_col)
        .agg(
            F.round(F.sum("term_score"), round_to).alias("score"),
            F.countDistinct("term").alias("_n_matched"),
        )
    )
    if min_match is not None and qterms:
        scored = scored.filter(
            F.col("_n_matched") >= parse_mm_spec(min_match, len(qterms))
        )
    mt_preds = []
    if wildcard is not None:
        prefixes = [wildcard] if isinstance(wildcard, str) else wildcard
        for p in prefixes:
            mt_preds.append(F.col("term").startswith(p))
    if term_range is not None:
        mt_preds.append(F.col("term").between(term_range[0], term_range[1]))
    for pred in mt_preds:
        # CONSTANT_SCORE_REWRITE: +1.0 per doc matching the multi-term
        # clause, OR-combined (full outer) with the scored clauses
        mt_docs = (
            tf.filter(pred)
            .select(key_col).distinct()
            .withColumn("_mt", F.lit(1.0))
        )
        scored = (
            scored.select(key_col, "score")
            .join(mt_docs, key_col, "full_outer")
            .withColumn(
                "score",
                F.round(
                    F.coalesce(F.col("score"), F.lit(0.0))
                    + F.coalesce(F.col("_mt"), F.lit(0.0)),
                    round_to,
                ),
            )
            .drop("_mt")
        )
    if req_terms:
        # MUST gate: a doc (even one matching only a constant-score
        # clause) must hold ALL required terms. Aggregation over the
        # required postings only — broadcast term set, tiny frame.
        # When combined with min_match, mm counts ALL scored clauses
        # (required terms score too; documented simplification vs
        # edismax's optional-only mm accounting).
        rqdf = spark.createDataFrame(
            [(t,) for t in req_terms], schema="term string")
        req_docs = (
            tf.join(F.broadcast(rqdf), "term")
            .groupBy(key_col)
            .agg(F.countDistinct("term").alias("_nr"))
            .filter(F.col("_nr") == len(req_terms))
            .select(key_col)
        )
        scored = scored.join(req_docs, key_col, "left_semi")
    if exclude_query is not None:
        ex_terms: List[str] = []
        for t in ANALYZERS[chain](exclude_query):
            if t not in ex_terms:
                ex_terms.append(t)
        if ex_terms:
            exdf = spark.createDataFrame(
                [(t,) for t in ex_terms], schema="term string")
            ex_docs = (
                tf.join(F.broadcast(exdf), "term").select(key_col).distinct()
            )
            scored = scored.join(ex_docs, key_col, "left_anti")
    if boost_query is not None:
        bq_terms: List[str] = []
        for t in ANALYZERS[chain](boost_query):
            if t not in bq_terms:
                bq_terms.append(t)
        if bq_terms:
            bqdf = spark.createDataFrame(
                [(t,) for t in bq_terms], schema="term string")
            bq_dfreq = (
                tf.join(F.broadcast(bqdf), "term")
                .groupBy("term").agg(F.count("*").alias("df"))
            )
            bq_scored = (
                tf.join(F.broadcast(bqdf), "term")
                .join(F.broadcast(bq_dfreq), "term")
                .join(ds, key_col)
                .crossJoin(F.broadcast(cs))
                .withColumn("term_score", score_expr)
                .groupBy(key_col)
                .agg(F.sum("term_score").alias("_bq"))
            )
            scored = (
                scored.join(bq_scored, key_col, "left")
                .withColumn(
                    "score",
                    F.round(
                        F.col("score")
                        + F.lit(boost_weight)
                        * F.coalesce(F.col("_bq"), F.lit(0.0)),
                        round_to,
                    ),
                )
                .drop("_bq")
            )
    if boost_function is not None or boost is not None:
        bf_col = (boost_function if boost_function is not None
                  else F.lit(0.0))
        bmul_col = boost if boost is not None else F.lit(1.0)
        side = docs.select(
            key_col, bf_col.alias("_bf"), bmul_col.alias("_bmul"))
        scored = (
            scored.join(side, key_col, "left")
            .withColumn(
                "score",
                F.round(
                    (F.col("score") + F.coalesce(F.col("_bf"), F.lit(0.0)))
                    * F.coalesce(F.col("_bmul"), F.lit(1.0)),
                    round_to,
                ),
            )
            .drop("_bf", "_bmul")
        )
    if phrase is not None:
        phrase_terms = ANALYZERS[chain](phrase)
        # semi-join against the phrase-matching doc set: the predicate is
        # a per-row expression on the SAME token scan (no re-analysis);
        # broadcast-ability is left to AQE (the match set is unbounded)
        pm = toks.filter(
            phrase_match_expr("tokens", phrase_terms, slop=phrase_slop)
        ).select(key_col)
        scored = scored.join(pm, key_col, "left_semi")
    if filter_query is not None:
        pred = (F.expr(filter_query) if isinstance(filter_query, str)
                else filter_query)
        scored = scored.join(
            docs.filter(pred).select(key_col), key_col, "left_semi")
    if return_all_scored:
        # the full matching set (for grouping/collapse consumers) — the
        # same frame the top-k is taken from, no rank cutoff applied
        return scored.select(key_col, "score")
    return (
        scored.orderBy(F.desc("score"), F.asc(key_col))
        .limit(k)
        .select(key_col, "score")
    )


def bm25_synonym_topk_plan(
    docs: DataFrame,
    query: str,
    chain,
    key_col: str = "doc_id",
    k: int = 10,
    k1: float = K1,
    b: float = B,
    round_to: int = 4,
) -> DataFrame:
    """BM25 top-k through a stopword + synonym analyzer chain
    (``SolrTextChain``): the index side is tokenizer + stop filter; the
    query side additionally expands synonyms — the index/query asymmetry
    of the reference's text_general/text_en field types
    (test/solr/conf/schema.xml:171-207).

    Each query position becomes an OR-group (Lucene SynonymQuery shape):
    group tf = sum of member tfs, group df = docs containing ANY member.
    Stopword removal happens JVM-side (array filter in codegen) and
    changes doc_len, so idf/length normalization see the filtered corpus,
    as a Lucene index built with a StopFilter would.
    """
    from ..functions.analyzer import stop_filter_expr
    from .postings import (collection_stats, doc_stats as _doc_stats,
                           term_freqs, with_tokens)

    spark = docs.sparkSession
    groups = chain.query_groups(query)
    # dedupe groups by membership, preserving first-occurrence order
    seen: set = set()
    uniq: List[List[str]] = []
    for g in groups:
        key = tuple(g)
        if key not in seen:
            seen.add(key)
            uniq.append(g)
    if not uniq:
        return docs.select(key_col).limit(0).withColumn("score", F.lit(0.0))

    toks = with_tokens(docs, chain=chain.base_name)
    if chain.stopwords:
        toks = toks.withColumn(
            "tokens", stop_filter_expr(F.col("tokens"), chain.stopwords)
        )
    tf = term_freqs(toks, key_col=key_col)
    ds = _doc_stats(toks, key_col=key_col)
    cs = collection_stats(ds)

    qdf = spark.createDataFrame(
        [(m, gi) for gi, g in enumerate(uniq) for m in g],
        schema="term string, grp int",
    )
    gtf = (
        tf.join(F.broadcast(qdf), "term")
        .groupBy(key_col, "grp")
        .agg(F.sum("tf").alias("tf"))
    )
    gdf = gtf.groupBy("grp").agg(F.count("*").alias("df"))
    matched = (
        gtf.join(F.broadcast(gdf), "grp")
        .join(ds, key_col)
        .crossJoin(F.broadcast(cs))
    )
    score_expr = (
        F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
        * F.col("tf") * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("doc_len") / F.col("avgdl"))
        )
    )
    return (
        matched.withColumn("group_score", score_expr)
        .groupBy(key_col)
        .agg(F.round(F.sum("group_score"), round_to).alias("score"))
        .orderBy(F.desc("score"), F.asc(key_col))
        .limit(k)
        .select(key_col, "score")
    )


def bm25_fuzzy_topk_plan(
    docs: DataFrame,
    fuzzy_word: str,
    key_col: str = "doc_id",
    k: int = 10,
    chain: str = "simple",
    max_edits: int = 2,
    prefix_len: int = 1,
    k1: float = K1,
    b: float = B,
    round_to: int = 4,
) -> DataFrame:
    """BM25 top-k for a single fuzzy term (``word~2`` — Lucene
    ``FuzzyQuery``, reachable through the reference's query parsers and
    the same term-dictionary machinery its DirectSolrSpellChecker uses,
    solrconfig-vanilla.xml:1256-1268).

    Expansion: the analyzed term dictionary is scanned for terms within
    ``max_edits`` levenshtein distance that share the first
    ``prefix_len`` characters (FuzzyQuery's prefixLength gate); the
    exact term itself (distance 0) is always a member. The expanded set
    then scores as ONE SynonymQuery-shaped group — group tf = sum of
    member tfs, group df = docs containing ANY member — the same
    blended-statistics intent as Lucene's
    ``TopTermsBlendedFreqScoringRewrite`` (documented deviation: Lucene
    additionally down-boosts by similarity and caps the expansion at
    maxExpansions=50; we score all members at full weight, which is
    SQL-provable).

    Scale shape: the dictionary scan is term-level (Heaps' law — far
    smaller than the corpus) with length-band + prefix predicates ahead
    of the levenshtein call, exactly like spellcheck.py; the expansion
    set is broadcast back against the postings, so the corpus-side plan
    is identical to any other multi-term OR query.
    """
    from .postings import (collection_stats, doc_stats as _doc_stats,
                           term_freqs, with_tokens)

    analyzed = ANALYZERS[chain](fuzzy_word)
    q = analyzed[0] if analyzed else ""
    if not q:
        return docs.select(key_col).limit(0).withColumn("score", F.lit(0.0))

    toks = with_tokens(docs, chain=chain)
    tf = term_freqs(toks, key_col=key_col)
    ds = _doc_stats(toks, key_col=key_col)
    cs = collection_stats(ds)

    qlen = len(q)
    expanded = (
        tf.select("term").distinct()
        .filter(F.length("term").between(qlen - max_edits, qlen + max_edits))
        .filter(F.substring("term", 1, prefix_len) == q[:prefix_len])
        .filter(F.levenshtein(F.col("term"), F.lit(q)) <= max_edits)
    )
    gtf = (
        tf.join(F.broadcast(expanded), "term")
        .groupBy(key_col)
        .agg(F.sum("tf").alias("tf"))
    )
    gdf = gtf.agg(F.count("*").alias("df"))
    matched = gtf.join(ds, key_col).crossJoin(F.broadcast(gdf)) \
                 .crossJoin(F.broadcast(cs))
    score_expr = (
        F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
              + 1.0)
        * F.col("tf") * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("doc_len") / F.col("avgdl"))
        )
    )
    return (
        matched.withColumn("score", F.round(score_expr, round_to))
        .orderBy(F.desc("score"), F.asc(key_col))
        .limit(k)
        .select(key_col, "score")
    )


def bm25_score_all(
    tf: DataFrame,
    doc_stats: DataFrame,
    n_docs: int,
    avgdl: float,
    query_terms_idf: Sequence[tuple[str, float]],
    key_col: str = "url",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Full (unlimited) score set for one query — used by rank-identity
    tests to compare every matching doc against the oracle."""
    spark = tf.sparkSession
    if not query_terms_idf:
        return tf.select(key_col).limit(0).withColumn("score", F.lit(0.0))
    qdf = spark.createDataFrame(
        list(query_terms_idf), schema="term string, idf double"
    )
    return (
        tf.join(F.broadcast(qdf), "term")
        .join(doc_stats, key_col)
        .withColumn(
            "term_score",
            F.col("idf") * F.col("tf") * F.lit(k1 + 1.0)
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("doc_len") / F.lit(avgdl))
            ),
        )
        .groupBy(key_col)
        .agg(F.sum("term_score").alias("score"))
    )


def bm25_grouped_topk(
    docs: DataFrame,
    query: str,
    group_col: str,
    key_col: str = "doc_id",
    k_groups: int = 10,
    k_per_group: int = 2,
    chain: str = "simple",
    k1: float = K1,
    b: float = B,
    round_to: int = 4,
    min_match: int | str | None = None,
) -> DataFrame:
    """Solr result grouping / field collapse
    (``group=true&group.field=X&group.limit=N``, the /select grouping
    surface): groups ranked by their BEST document's score (Solr's
    default ``group.sort=score desc``), each carrying its matching-doc
    count (``numFound`` per group) and its top ``k_per_group`` documents
    ranked within the group. Output one row per kept (group, doc):
    ``(group, group_found, rank, key, score)``.

    Scale shape: the scoring core is :func:`bm25_topk_sql_plan`'s plan
    (matched postings only — docs with zero query terms never enter);
    grouping adds one window over ``group_col`` partitions (a shuffle
    keyed on the group field, partial-ordered per group, no global
    sort of the corpus) and a groups-level top-k that is
    TakeOrderedAndProject over one row per group.
    """
    from pyspark.sql import Window

    scored = bm25_topk_sql_plan(
        docs, query, key_col=key_col, chain=chain, k1=k1, b=b,
        round_to=round_to, min_match=min_match, return_all_scored=True,
    )
    tagged = scored.join(docs.select(key_col, group_col), key_col)
    w = Window.partitionBy(group_col).orderBy(
        F.desc("score"), F.asc(key_col))
    ranked = tagged.withColumn("rank", F.row_number().over(w))
    groups = (
        tagged.groupBy(group_col)
        .agg(F.count("*").cast("long").alias("group_found"),
             F.max("score").alias("_top"))
        .orderBy(F.desc("_top"), F.asc(group_col))
        .limit(k_groups)
    )
    return (
        ranked.filter(F.col("rank") <= k_per_group)
        .join(groups, group_col)
        .select(group_col, "group_found", "rank", key_col, "score")
    )


def more_like_this(
    docs: DataFrame,
    doc_key,
    key_col: str = "doc_id",
    text_col: str = "text",
    chain: str = "simple",
    max_query_terms: int = 10,
    min_term_freq: int = 1,
    min_doc_freq: int = 2,
    k: int = 10,
    k1: float = K1,
    b: float = B,
    round_to: int = 4,
) -> DataFrame:
    """Solr MoreLikeThis (the /mlt handler, Lucene MoreLikeThis):
    find documents similar to ``doc_key`` by (1) selecting the source
    document's ``max_query_terms`` most "interesting" terms — highest
    ``tf * ln(N/df)``, Lucene's interestingTerms scoring, subject to the
    ``min_term_freq``/``min_doc_freq`` floors — then (2) running a
    standard BM25 OR-query with those terms, the source doc excluded.
    Tie-breaks: term ascending for interesting-term selection, key
    ascending for result ranks. Returns ``(key, score)``, k rows.

    Scale shape: entirely one DataFrame plan — the source doc's term
    profile is a keyed filter (parquet-prunable), interesting-term
    selection is a TakeOrderedAndProject over that handful of rows, and
    the similarity query is the standard broadcast-semi-scan BM25 plan
    (only postings of the <= max_query_terms terms survive the scan).
    No driver collect anywhere.
    """
    from .postings import (collection_stats, doc_stats as _doc_stats,
                           term_freqs, with_tokens)

    toks = with_tokens(docs, chain=chain, text_col=text_col)
    tf = term_freqs(toks, key_col=key_col)
    ds = _doc_stats(toks, key_col=key_col)
    cs = collection_stats(ds)

    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    src = (
        tf.filter(F.col(key_col) == doc_key)
        .filter(F.col("tf") >= min_term_freq)
        .join(dfreq, "term")
        .filter(F.col("df") >= min_doc_freq)
        .crossJoin(F.broadcast(cs.select("n_docs")))
        .withColumn("interest",
                    F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
        .orderBy(F.desc("interest"), F.asc("term"))
        .limit(max_query_terms)
        .select("term", "df")
    )
    matched = (
        tf.join(F.broadcast(src), "term")
        .filter(F.col(key_col) != doc_key)
        .join(ds, key_col)
        .crossJoin(F.broadcast(cs))
    )
    score_expr = (
        F.log((F.col("n_docs") - F.col("df") + 0.5)
              / (F.col("df") + 0.5) + 1.0)
        * F.col("tf") * F.lit(k1 + 1.0)
        / (F.col("tf")
           + F.lit(k1) * (F.lit(1.0 - b)
                          + F.lit(b) * F.col("doc_len") / F.col("avgdl")))
    )
    return (
        matched.withColumn("term_score", score_expr)
        .groupBy(key_col)
        .agg(F.round(F.sum("term_score"), round_to).alias("score"))
        .orderBy(F.desc("score"), F.asc(key_col))
        .limit(k)
    )


def highlight_topk(
    docs: DataFrame,
    query: str,
    key_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    frag_chars: int = 60,
    chain: str = "simple",
    round_to: int = 4,
) -> DataFrame:
    """Solr highlighting (hl=true&hl.fl=text&hl.snippets=1), simplified
    to deterministic first-fragment semantics: for each BM25 top-k doc,
    the earliest raw-text occurrence of any analyzed query term picks
    the matched term (ties: lexicographically smallest term at that
    position) and a ``frag_chars`` window starting at most 30 chars
    before it is the snippet. Returns ``(key, score, matched_term,
    match_pos, snippet)``; docs whose raw text contains no analyzed
    term verbatim (e.g. stemming changed the surface form) get NULL
    highlight columns, like Solr's empty-highlight response entry.

    Scale shape: the top-k is the standard BM25 plan; highlighting is a
    k-row broadcast-side join back to the doc text plus pure string
    expressions (locate/substring in whole-stage codegen) — the corpus
    is never rescanned for fragments.
    """
    qterms: List[str] = []
    for t in ANALYZERS[chain](query):
        if t not in qterms:
            qterms.append(t)
    top = bm25_topk_sql_plan(
        docs, query, key_col=key_col, k=k, chain=chain, round_to=round_to)
    joined = top.join(docs.select(key_col, text_col), key_col)

    NOPOS = 1 << 30
    lower = F.lower(F.col(text_col))
    cands = F.array(*[
        F.struct(
            F.when(F.locate(t, lower) > 0, F.locate(t, lower))
            .otherwise(F.lit(NOPOS)).cast("int").alias("pos"),
            F.lit(t).alias("term"),
        )
        for t in sorted(qterms)
    ])
    best = F.array_min(cands)
    found = best["pos"] < NOPOS
    start = F.greatest(best["pos"] - 30, F.lit(1))
    return joined.select(
        key_col, "score",
        F.when(found, best["term"]).alias("matched_term"),
        F.when(found, best["pos"]).cast("int").alias("match_pos"),
        F.when(found,
               F.substring(F.col(text_col), start, frag_chars))
        .alias("snippet"),
    )


def elevate_topk(
    docs: DataFrame,
    query: str,
    elevate_ids: Sequence[int],
    key_col: str = "doc_id",
    k: int = 10,
    chain: str = "simple",
    round_to: int = 4,
    force: bool = True,
) -> DataFrame:
    """Solr QueryElevationComponent (``/elevate`` handler,
    ``test/solr/conf/solrconfig-vanilla.xml:1522-1537`` + ``elevate.xml``):
    the docs listed for a query are pinned to the top of the result in
    their configured order; everything else follows in normal BM25 order.

    ``force=True`` is Solr's ``forceElevation``: an elevated doc appears
    even when it does not match the query at all (its ``score`` is NULL
    then, since it was never scored — Solr reports such docs with the
    sentinel elevation sort value). ``force=False`` only re-sorts docs
    already in the result set (left join instead of full).

    Scale shape: the elevation list is configuration-sized (an
    ``elevate.xml`` of at most a few hundred ids), so the join against
    the scored frame is a broadcast by construction; the BM25 scoring
    plan itself is untouched — elevation is a pure post-scoring sort-key
    rewrite, exactly how the Lucene component injects its sort comparator
    in front of the score sort.

    Returns ``(key, score, elevated)`` — top ``k`` rows.
    """
    scored = bm25_topk_sql_plan(
        docs, query, key_col=key_col, chain=chain, round_to=round_to,
        return_all_scored=True,
    )
    spark = docs.sparkSession
    edf = spark.createDataFrame(
        [(int(i), p) for p, i in enumerate(elevate_ids, 1)],
        schema=f"{key_col} long, elev_pos int",
    )
    # full outer keeps unmatched elevated docs (forceElevation); the
    # elevation side is tiny so AQE plans the cheap side appropriately
    joined = scored.join(edf, key_col, "full" if force else "left")
    return (
        joined.orderBy(
            F.when(F.col("elev_pos").isNotNull(), F.lit(0))
            .otherwise(F.lit(1)),
            F.asc_nulls_last("elev_pos"),
            F.desc_nulls_last("score"),
            F.asc(key_col),
        )
        .limit(k)
        .select(
            key_col, "score",
            F.col("elev_pos").isNotNull().alias("elevated"),
        )
    )


def explain_topk(
    docs: DataFrame,
    query: str,
    key_col: str = "doc_id",
    k: int = 10,
    chain: str = "simple",
    k1: float = K1,
    b: float = B,
    round_to: int = 4,
) -> DataFrame:
    """Solr DebugComponent score explanation (``debug=true`` /
    ``debugQuery``, solrconfig-vanilla.xml:1206 — ``solr.DebugComponent``
    in the default component chain): for every BM25 top-``k`` doc, one
    row PER MATCHED QUERY TERM with the quantities Lucene's explain tree
    reports — tf, df, doc length and the term's score contribution —
    plus the doc's total score. The per-term rows sum to the doc score
    (Lucene's "sum of:" root node).

    Scale shape: identical plan to the top-k itself (same tf/stats
    frames, broadcast query dict) plus one key semi-join of the matched
    postings against the k winning keys — explain output is k×|q| rows,
    never a corpus-sized frame.
    """
    from .postings import (collection_stats, doc_stats as _doc_stats,
                           term_freqs, with_tokens)

    spark = docs.sparkSession
    qterms: List[str] = []
    for t in ANALYZERS[chain](query):
        if t not in qterms:
            qterms.append(t)

    toks = with_tokens(docs, chain=chain)
    tf = term_freqs(toks, key_col=key_col)
    ds = _doc_stats(toks, key_col=key_col)
    cs = collection_stats(ds)

    qdf = spark.createDataFrame([(t,) for t in qterms], schema="term string")
    dfreq = (
        tf.join(F.broadcast(qdf), "term")
        .groupBy("term").agg(F.count("*").alias("df"))
    )
    matched = (
        tf.join(F.broadcast(qdf), "term")
        .join(F.broadcast(dfreq), "term")
        .join(ds, key_col)
        .crossJoin(F.broadcast(cs))
    )
    term_score = (
        F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
              + 1.0)
        * F.col("tf") * F.lit(k1 + 1.0)
        / (F.col("tf") + F.lit(k1)
           * (F.lit(1.0 - b) + F.lit(b) * F.col("doc_len") / F.col("avgdl")))
    )
    per_term = matched.withColumn("term_score", term_score)
    totals = (
        per_term.groupBy(key_col)
        .agg(F.round(F.sum("term_score"), round_to).alias("score"))
    )
    topk = totals.orderBy(F.desc("score"), F.asc(key_col)).limit(k)
    return (
        per_term.join(F.broadcast(topk), key_col)
        .select(
            key_col, "score", "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.col("doc_len").cast("long").alias("doc_len"),
            F.round("term_score", round_to).alias("term_score"),
        )
    )


def cluster_topk(
    docs: DataFrame,
    query: str,
    key_col: str = "doc_id",
    k: int = 10,
    chain: str = "simple",
    round_to: int = 4,
) -> DataFrame:
    """Search-result clustering (the reference config's Carrot2
    ``clustering`` searchComponent + ``/clustering`` handler,
    solrconfig-vanilla.xml:1395-1498), as a deterministic single-label
    stand-in for the Lingo algorithm: each BM25 top-``k`` doc is labeled
    by its most salient non-query term — max ``tf * ln(n_docs/df)`` with
    collection-wide df (Carrot2 reads index stats the same way), ties by
    term asc — and a cluster is the group of docs sharing a label.
    Query words are excluded from labels (Carrot2's query-word filter).

    Returns one row per top-k doc: ``(key, label, salience)``.

    Scale shape: the result set is k rows, so the per-doc term frame is
    a key semi-join against k keys (broadcast by construction); the only
    corpus-sized work is the df aggregation the other query operators
    already share. Lingo's SVD step is deliberately NOT reproduced —
    label election is a window row_number over k*|doc terms| rows.
    """
    from pyspark.sql import Window

    from .postings import (collection_stats, doc_stats as _doc_stats,
                           term_freqs, with_tokens)

    qterms = set(ANALYZERS[chain](query))
    top = bm25_topk_sql_plan(
        docs, query, key_col=key_col, k=k, chain=chain, round_to=round_to)

    toks = with_tokens(docs, chain=chain)
    tf = term_freqs(toks, key_col=key_col)
    cs = collection_stats(_doc_stats(toks, key_col=key_col))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))

    cand = (
        tf.join(F.broadcast(top.select(key_col)), key_col)
        .filter(~F.col("term").isin(*sorted(qterms)))
        .join(dfreq, "term")
        .crossJoin(F.broadcast(cs))
        .withColumn(
            "salience",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")),
                    round_to),
        )
    )
    w = Window.partitionBy(key_col).orderBy(
        F.desc("salience"), F.asc("term"))
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(key_col, F.col("term").alias("label"), "salience")
    )


def bm25_query_string_topk(
    docs: DataFrame,
    qstring: str,
    key_col: str = "doc_id",
    k: int = 10,
    chain: str = "simple",
    k1: float = K1,
    b: float = B,
    round_to: int = 4,
    **plan_kw,
) -> DataFrame:
    """The query-STRING front door: parse one flat Lucene/Solr query
    string (the syntax the reference's ``defType=lucene`` handlers
    accept — ``test/solr/conf/solrconfig.xml:71``,
    ``SolrReIndexer.java:34``) and run it through the structured BM25
    plans.

    ``'+spark -batch merge^2 "table hash" str* [sa TO sz]'`` becomes
    one :func:`bm25_topk_sql_plan` call with ``require_query`` /
    ``exclude_query`` / ``term_boosts`` / ``phrase`` / ``wildcard`` /
    ``term_range`` filled in; a fuzzy-only string (``'sparc~2'``)
    dispatches to :func:`bm25_fuzzy_topk_plan`. Unsupported syntax
    raises ``QueryStringError`` — never a silent drop. ``plan_kw``
    passes extra structured parameters (``filter_query``, ``bq``/...)
    straight through; parser-produced keys win on conflict only by
    raising, not overriding.
    """
    from ..functions.query_parser import QueryStringError, parse_query_string

    pq = parse_query_string(qstring)
    if pq.fuzzy:
        word, edits = pq.fuzzy[0]
        return bm25_fuzzy_topk_plan(
            docs, word, key_col=key_col, k=k, chain=chain,
            max_edits=edits, k1=k1, b=b, round_to=round_to,
        )
    kw = pq.plan_kwargs()
    overlap = set(kw) & set(plan_kw)
    if overlap:
        raise QueryStringError(
            f"structured kwargs {sorted(overlap)} conflict with clauses "
            "parsed from the query string"
        )
    kw.update(plan_kw)
    return bm25_topk_sql_plan(
        docs, kw.pop("query"), key_col=key_col, k=k, chain=chain,
        k1=k1, b=b, round_to=round_to, **kw,
    )
