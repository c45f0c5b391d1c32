"""BM25 full-text retrieval: top-k training docs per query.

The retrieval side of corpus hygiene and data curation: given a small
query set (an eval benchmark, a "find documents like this" probe, a
dedup seed), rank the corpus by Okapi BM25 and keep the top-k per
query.  Complements the n-gram-overlap decontamination check
(operators/contamination.py) with the ranked-retrieval form most
modern decontamination / data-selection pipelines use.

Scale shape (the 100 TB posture):

1. the QUERY side is tiny (benchmarks, probes) — its distinct term
   vocabulary broadcasts;
2. the corpus token explode is pruned against that broadcast
   vocabulary BEFORE anything shuffles (same move as
   contamination_check) — only postings whose term occurs in some
   query ever leave the scan stage;
3. the pruned posting stream (doc_id, term, tf, dl) is materialized
   once and feeds both the document-frequency aggregate (for idf) and
   the scoring join;
4. idf and the query-term table are broadcast back against the
   postings — the only wide shuffle is the final per-(query, doc)
   score aggregation, bounded by |query vocab| x per-term doc count;
5. top-k per query is the two-stage distributed TopK (per-partition
   survivors, then final rank) — no single-reducer sort.

Float parity with the DuckDB oracle twin: every scalar is computed by
an identical expression tree (IEEE ops are bit-deterministic), and
constants like k1+1 are pre-computed in Python and embedded as
literals on BOTH sides, so neither engine evaluates `1.2 + 1` at
runtime.  Two deliberate quantizations make the score bit-equal AND
cheap:

- ln() is the one libm call and Java's Math.log vs DuckDB's std::log
  CAN differ by 1 ulp (measured: 14/100 scores off by ~1e-15 when idf
  is used raw), so the idf is quantized once per distinct
  document-frequency with an EXACT floor — floor(ln(...)*1e6)/1e6 —
  after which every op is IEEE-deterministic.  A 1-ulp ln difference
  only survives the floor if ln(x)*1e6 sits within ~1e-10 of an
  integer (~1e-10 probability per distinct df, and the gate data is
  fixed per round — verified at sf0.001/0.01/0.1 by
  tests/test_retrieval.py).
- each term CONTRIBUTION is floored to an integer count of 2^-20
  units.  Integer-valued doubles below 2^53 sum EXACTLY in any order,
  so the per-(query, doc) score is a plain F.sum — which partial-
  aggregates map-side before the shuffle — instead of a
  collect_list + sort + fold (which cannot combine map-side and, on
  a common query term matching most of the corpus, shuffled every
  raw contribution row: measured 30 s -> ~2 s at sf0.1).  Headroom:
  contrib < 34, so 2^20-scaled terms stay < 2^26 and a query would
  need ~2^27 matched terms to approach 2^53.  Score resolution 1e-6
  — ranking ties that creates are broken by doc_id on both sides.

Reference parity note: the reference pipeline (Haensel AMS challenge)
has no retrieval operator — this is part of the LLM-training-data
extension tier (driver brief), alongside dedup / contamination / ANN.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from ..checkpoint import materialize

#: Okapi BM25 defaults.
BM25_K1 = 1.2
BM25_B = 0.75

#: retrieval token pattern: lower-cased letter/digit runs.
SEARCH_TOKEN_PATTERN = "[a-z0-9]+"


def search_tokens(col: Column | str) -> Column:
    """Lower-cased word tokens for retrieval.
    DuckDB twin: regexp_extract_all(lower(x), '[a-z0-9]+')."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(SEARCH_TOKEN_PATTERN), 0)


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
    exclude_self: bool = True,
    max_df_frac: float | None = None,
) -> DataFrame:
    """Top-k corpus docs per query under Okapi BM25.

    Output: (query_id, doc_id, n_matched, score, rank), rank 1..k per
    query ordered by (score desc, doc_id) — the deterministic
    tie-break every TopK in this engine uses.

    ``exclude_self`` drops doc_id == query_id pairs (queries derived
    from corpus docs would trivially retrieve themselves).

    ``max_df_frac`` is common-term pruning — the retrieval form of
    this engine's flood caps: a query term whose document frequency
    exceeds ``max_df_frac * N`` matches a constant fraction of ANY
    corpus (Zipf head terms: 'the', markup tokens), so its posting
    list floods the contrib join with rows whose idf weight carries
    almost no ranking signal.  Dropping those terms bounds contrib
    volume at |queries| x terms-per-query x (max_df_frac * N) — on
    the Zipfian scale bench this is the difference between 20.6 M and
    O(1 M) contrib rows for 100 queries on a 12 M-token corpus.  It
    is an explicit approximation (scores lose the flooded terms'
    small contributions) and is OFF by default; n_matched counts only
    kept terms.
    """
    k1p1 = k1 + 1.0
    one_minus_b = 1.0 - b

    toks = search_tokens(text_col)
    base = docs.select(
        F.col(id_col).alias("__did"),
        F.size(toks).cast("double").alias("__dl"),
        toks.alias("__toks"),
    ).filter(F.col("__dl") > 0)

    # corpus stats: one tiny aggregate row, broadcast-cross-joined
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("__n_docs"),
        (
            F.sum("__dl").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("__avgdl"),
    )

    qt = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.array_distinct(search_tokens(query_text_col))).alias("term"),
    )
    vocab = qt.select("term").distinct()

    # prune the corpus explode against the broadcast query vocabulary
    # BEFORE any shuffle; materialize the surviving postings once —
    # they feed both the df aggregate and the scoring join
    postings = (
        base.select("__did", "__dl", F.explode("__toks").alias("term"))
        .join(F.broadcast(vocab), "term")
        .groupBy("__did", "__dl", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("__tf"))
    )
    postings = materialize(postings)

    # document frequency per (query-vocab) term -> idf; |vocab| rows
    dfreq = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("__df")
    )
    if max_df_frac is not None:
        # common-term pruning (docstring): the cap is evaluated on the
        # tiny dfreq table, and the inner join below then drops the
        # flooded terms' postings without any extra shuffle
        dfreq = dfreq.crossJoin(F.broadcast(stats)).filter(
            F.col("__df") <= F.lit(max_df_frac) * F.col("__n_docs")
        ).select("term", "__df")

    # idf quantized with an exact floor (module docstring: ln parity)
    idf_q = (
        F.floor(
            F.log(
                (F.col("__n_docs") - F.col("__df") + F.lit(0.5))
                / (F.col("__df") + F.lit(0.5))
                + F.lit(1.0)
            )
            * F.lit(1000000.0)
        ).cast("double")
        / F.lit(1000000.0)
    )
    scored_terms = (
        postings.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qt), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__contrib",
            # floored to 2^-20 units: integer-valued doubles sum
            # exactly in ANY order (module docstring), so the score
            # aggregate below partial-aggregates map-side
            F.floor(
                idf_q
                * (
                    (F.col("__tf") * F.lit(k1p1))
                    / (
                        F.col("__tf")
                        + F.lit(k1)
                        * (
                            F.lit(one_minus_b)
                            + F.lit(b) * (F.col("__dl") / F.col("__avgdl"))
                        )
                    )
                )
                * F.lit(1048576.0)
            ).cast("double"),
        )
    )
    if exclude_self:
        scored_terms = scored_terms.filter(F.col("__did") != F.col("query_id"))

    grouped = scored_terms.groupBy("query_id", "__did").agg(
        F.count(F.lit(1)).cast("long").alias("n_matched"),
        (F.sum("__contrib") / F.lit(1048576.0)).alias("score"),
    )

    # two-stage distributed TopK (similarity.ann_topk_brute pattern)
    local = Window.partitionBy("query_id", "__pid").orderBy(
        F.col("score").desc(), F.col("__did").asc()
    )
    final = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("__did").asc()
    )
    return (
        grouped.withColumn("__pid", F.spark_partition_id())
        .withColumn("__lrn", F.row_number().over(local))
        .filter(F.col("__lrn") <= k)
        .withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= k)
        .select(
            F.col("query_id"),
            F.col("__did").alias("doc_id"),
            "n_matched",
            "score",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def bm25_sql(
    queries_cte: str,
    k: int = 5,
    k1: float = BM25_K1,
    b: float = BM25_B,
    exclude_self: bool = True,
    max_df_frac: float | None = None,
    pfx: str = "bm",
) -> str:
    """DuckDB twin of :func:`bm25_topk`, stage-for-stage.

    ``queries_cte`` must be a SELECT yielding (query_id, qtext).
    Returns a CTE chain ending in ``{pfx}_topk`` with columns
    (query_id, doc_id, n_matched, score, rank).
    """
    k1p1 = repr(k1 + 1.0)
    one_minus_b = repr(1.0 - b)
    self_pred = f"AND p.__did <> q.query_id" if exclude_self else ""
    return f"""
        {pfx}_q AS ({queries_cte}),
        {pfx}_qt AS (
            SELECT query_id, unnest(list_distinct(
                       regexp_extract_all(lower(qtext), '{SEARCH_TOKEN_PATTERN}')
                   )) AS term
            FROM {pfx}_q),
        {pfx}_vocab AS (SELECT DISTINCT term FROM {pfx}_qt),
        {pfx}_base AS (
            SELECT doc_id AS __did,
                   CAST(len(regexp_extract_all(lower(text), '{SEARCH_TOKEN_PATTERN}')) AS DOUBLE) AS __dl,
                   regexp_extract_all(lower(text), '{SEARCH_TOKEN_PATTERN}') AS __toks
            FROM documents
            WHERE len(regexp_extract_all(lower(text), '{SEARCH_TOKEN_PATTERN}')) > 0),
        {pfx}_stats AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS __n_docs,
                   CAST(SUM(__dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS __avgdl
            FROM {pfx}_base),
        {pfx}_postings AS (
            SELECT e.__did, e.__dl, e.term,
                   CAST(COUNT(*) AS DOUBLE) AS __tf
            FROM (SELECT __did, __dl, unnest(__toks) AS term
                  FROM {pfx}_base) e
            JOIN {pfx}_vocab v ON v.term = e.term
            GROUP BY 1, 2, 3),
        {pfx}_dfreq AS (
            SELECT term, __df FROM (
                SELECT term, CAST(COUNT(*) AS DOUBLE) AS __df
                FROM {pfx}_postings GROUP BY term) d
            CROSS JOIN {pfx}_stats s
            WHERE {f"d.__df <= {repr(max_df_frac)} * s.__n_docs" if max_df_frac is not None else "TRUE"}),
        {pfx}_contrib AS (
            SELECT q.query_id, p.__did, p.term,
                   floor((floor(ln((s.__n_docs - d.__df + 0.5) / (d.__df + 0.5) + 1.0)
                                * 1000000.0) / 1000000.0)
                         * ((p.__tf * {k1p1})
                            / (p.__tf + {repr(k1)}
                               * ({one_minus_b} + {repr(b)} * (p.__dl / s.__avgdl))))
                         * 1048576.0)
                   AS __contrib
            FROM {pfx}_postings p
            JOIN {pfx}_dfreq d ON d.term = p.term
            JOIN {pfx}_qt q ON q.term = p.term
            CROSS JOIN {pfx}_stats s
            WHERE TRUE {self_pred}),
        {pfx}_grouped AS (
            SELECT query_id, __did,
                   CAST(COUNT(*) AS BIGINT) AS n_matched,
                   SUM(__contrib) / 1048576.0 AS score
            FROM {pfx}_contrib GROUP BY 1, 2),
        {pfx}_topk AS (
            SELECT query_id, __did AS doc_id, n_matched, score,
                   CAST(rank AS BIGINT) AS rank
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY score DESC, __did) AS rank
                  FROM {pfx}_grouped) t
            WHERE rank <= {k})"""
