"""Corpus vocabulary statistics: tokenizer-training support.

Two corpus-wide aggregates every tokenizer-training pipeline needs
before any merge learning can start:

- :func:`vocab_top_terms` — the term frequency table (top-N), the seed
  vocabulary / coverage diagnostic;
- :func:`bpe_pair_top` — adjacent-token pair frequencies over the
  BPE-ish token stream, i.e. the statistic a BPE trainer's FIRST merge
  round maximizes (Sennrich et al. 2016).  One round is the honest
  distributed primitive: full BPE training iterates driver-side over a
  shrinking alphabet and is not a data-parallel operator; the pair
  count IS, and re-running it after applying a merge is exactly how a
  Spark-side BPE trainer would loop.

Scale shape: both are the canonical map-side-combinable word count —
explode -> partial aggregate in the scan stage -> one shuffle on the
term, then a global top-N via Spark's TakeOrdered (per-partition heap,
driver merges N rows, never a full sort).  Ties break (count desc,
term asc) so results are deterministic across partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions.text import BPE_ISH_PATTERN


def _bpe_tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0)


def adjacent_pairs_of(toks: Column) -> Column:
    """Adjacent pairs 'a b' of an existing token-array column
    (row-local).

    ``toks`` MUST be a bound column reference, not an inline
    tokenizer expression: subexpression elimination does not reach
    inside higher-order-function lambdas, so an inline
    ``regexp_extract_all`` here re-tokenizes the text for EVERY
    ``element_at`` call — measured 10.2 s vs 1.5 s over sf0.1 for the
    same logical result.  Stage the array through a projection first
    (see :func:`term_pair_counts` / :func:`bpe_pair_top`).

    DuckDB twin:
    ``CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)),
    i -> toks[i] || ' ' || toks[i+1]) ELSE [] END``.
    """
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat(
            F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
        ),
    )
    return F.when(F.size(toks) >= 2, pairs).otherwise(
        F.array().cast("array<string>")
    )


def _tok_df(docs: DataFrame, text_col: str) -> DataFrame:
    """Token arrays staged through a projection (see adjacent_pairs_of)."""
    return docs.select(_bpe_tokens(text_col).alias("__toks"))


def _topn(counted: DataFrame, n: int) -> DataFrame:
    # orderBy+limit compiles to TakeOrderedAndProject (per-partition
    # heap of n, driver merge) — the global-window rank then runs over
    # those n rows only, never the full vocabulary
    return (
        counted.orderBy(F.desc("n_occurrences"), F.asc("term"))
        .limit(n)
        .selectExpr(
            "*",
            "CAST(row_number() OVER (ORDER BY n_occurrences DESC, "
            "term ASC) AS BIGINT) AS rank",
        )
    )


def term_pair_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(kind, term, n_occurrences) for kind in ('term', 'pair') — ONE
    tokenize + ONE explode + ONE map-side-combinable shuffle for both
    statistics.

    The BPE_ISH regex pass dominates the cost at corpus scale
    (measured ~3 s per pass over sf0.1), so terms and pairs are
    concatenated row-locally into a single tagged stream instead of
    two scans; callers wanting both top-Ns should
    ``checkpoint.materialize`` this once and filter per kind.
    """
    toks = F.col("__toks")
    tagged = F.concat(
        F.transform(
            toks, lambda t: F.concat(F.lit("t "), t)
        ),
        F.transform(
            adjacent_pairs_of(toks), lambda p: F.concat(F.lit("p "), p)
        ),
    )
    return (
        _tok_df(docs, text_col)
        .select(F.explode(tagged).alias("__tagged"))
        .groupBy("__tagged")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        .select(
            F.when(F.substring("__tagged", 1, 1) == "t", F.lit("term"))
            .otherwise(F.lit("pair"))
            .alias("kind"),
            F.expr("substring(__tagged, 3)").alias("term"),
            "n_occurrences",
        )
    )


def vocab_top_terms(
    docs: DataFrame, n: int = 50, text_col: str = "text"
) -> DataFrame:
    """Top-n BPE-ish terms by corpus occurrence count.

    Output: (term, n_occurrences, rank).  The rank window runs over
    the ALREADY-LIMITED n rows (TakeOrdered first), so the single
    partition it implies holds n rows, not the vocabulary.
    """
    counted = (
        docs.select(F.explode(_bpe_tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
    )
    return _topn(counted, n)


def bpe_pair_top(
    docs: DataFrame, n: int = 50, text_col: str = "text"
) -> DataFrame:
    """Top-n adjacent token pairs — the BPE first-merge candidates.

    Output: (term, n_occurrences, rank) where term is 'tok_a tok_b'.
    """
    counted = (
        _tok_df(docs, text_col)
        .select(F.explode(adjacent_pairs_of(F.col("__toks"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
    )
    return _topn(counted, n)


def topn_of_kind(counted: DataFrame, kind: str, n: int = 50) -> DataFrame:
    """Top-n (term, n_occurrences, rank) slice of a
    :func:`term_pair_counts` result for one kind."""
    return _topn(counted.filter(F.col("kind") == kind).drop("kind"), n)


def vocab_sql(bpe_pattern_sql: str, n: int = 50, pfx: str = "vt") -> str:
    """DuckDB twin CTE chain: ``{pfx}_terms`` and ``{pfx}_pairs``,
    each (term, n_occurrences, rank) with the same (count desc, term)
    tie-break."""
    return f"""
        {pfx}_tok AS (
            SELECT regexp_extract_all(text, '{bpe_pattern_sql}') AS toks
            FROM documents),
        {pfx}_terms AS (
            SELECT term, n_occurrences,
                   CAST(ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, term)
                        AS BIGINT) AS rank
            FROM (SELECT term, CAST(COUNT(*) AS BIGINT) AS n_occurrences
                  FROM (SELECT unnest(toks) AS term FROM {pfx}_tok)
                  GROUP BY term)
            ORDER BY n_occurrences DESC, term LIMIT {n}),
        {pfx}_pairs AS (
            SELECT term, n_occurrences,
                   CAST(ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, term)
                        AS BIGINT) AS rank
            FROM (SELECT term, CAST(COUNT(*) AS BIGINT) AS n_occurrences
                  FROM (SELECT unnest(CASE WHEN len(toks) >= 2
                            THEN list_transform(range(1, len(toks)),
                                                i -> toks[i] || ' ' || toks[i+1])
                            ELSE []::VARCHAR[] END) AS term
                        FROM {pfx}_tok)
                  GROUP BY term)
            ORDER BY n_occurrences DESC, term LIMIT {n})"""
