"""Multinomial Naive Bayes document classification — the
classifier-filter tier of a curation pipeline (CCNet / DCLM /
FineWeb-Edu run a linear fasttext-style classifier to keep
"high-quality-looking" documents; the distributed-primitive core of
that is exact multinomial NB over token counts, implemented here with
the engine's float-parity discipline so the trained model AND the
predictions hash-check against the DuckDB oracle).

Model (Laplace-smoothed multinomial NB, self-trained on the corpus
with ``label_col`` as supervision):

    score(d, c) = ln P(c) + sum_{t in d} ln p(t | c)
    p(t | c)    = (count(t, c) + 1) / (n_tok_c + V)

    prediction  = argmax_c score(d, c), ties -> smallest label

Scale shape (the lm.py pattern, one more key column):

1. one map-side-combinable groupBy on (label, term) trains the model;
   class totals and priors fold from the model table / a per-class
   count — both broadcast-class (|classes| rows);
2. scoring joins the token stream against the model on the term (the
   model is the small side: |V| x |classes| rows), aggregates
   per (doc, class) — map-side combinable;
3. classes a document shares NO token with still score (prior +
   n_d * ln p0_c): the per-doc grid is docs x |classes| via a
   broadcast cross join of the tiny class table, left-joined with the
   present-token sums;
4. the per-doc argmax is a groupBy min over a (-score, label) struct
   — never a window.

Float parity: every ln is floor-quantized to 1e-6 units per DISTINCT
(term, class) / class, making contributions integer-valued doubles
whose sums and integer multiples are exact in any order; the argmax
compares quantized integers, so the prediction is bit-stable across
engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..checkpoint import materialize
from .retrieval import search_tokens


def nb_classify_docs(
    docs: DataFrame,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """Train multinomial NB on ``docs`` (supervision = ``label_col``)
    and score every document.

    Output: (doc_id, nb_pred, nb_logp) — the argmax class and its
    total quantized log-score (nats).  Zero-token documents are absent
    (callers left-join and keep NULLs), matching the LM operators.
    """
    src = (
        F.col(tokens_col) if tokens_col is not None
        else search_tokens(text_col)
    )
    toks = docs.select(
        F.col(id_col).alias("__did"),
        F.col(label_col).alias("__lbl"),
        src.alias("__t"),
    ).filter(F.size("__t") > 0)
    ex = toks.select("__did", "__lbl", F.explode("__t").alias("term"))

    # TWO materialized diamond roots, both bounded: the (class, term)
    # model (feeds class totals, V, and the scoring join) and the
    # 1-row-per-doc meta table (feeds priors, the scoring grid and the
    # total count) — without the latter, every per-doc consumer would
    # re-run the corpus tokenize (5 passes measured vs 3 here; the
    # token STREAM itself is never materialized, per DESIGN.md).
    counts = materialize(
        ex.groupBy("__lbl", "term").agg(
            F.count(F.lit(1)).cast("double").alias("__c")
        )
    )
    docs_meta = materialize(
        toks.select(
            "__did", "__lbl", F.size("__t").cast("double").alias("__n")
        )
    )
    n_tok_c = counts.groupBy("__lbl").agg(F.sum("__c").alias("__ntok"))
    n_doc_c = docs_meta.groupBy("__lbl").agg(
        F.count(F.lit(1)).cast("double").alias("__ndoc")
    )
    vstats = counts.select("term").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("__v")
    )
    n_docs_total = docs_meta.agg(
        F.count(F.lit(1)).cast("double").alias("__ndocs")
    )
    q = F.lit(1000000.0)
    cls = (
        n_tok_c.join(n_doc_c, "__lbl")
        .crossJoin(F.broadcast(vstats))
        .crossJoin(F.broadcast(n_docs_total))
        .select(
            "__lbl",
            F.floor(F.log(F.col("__ndoc") / F.col("__ndocs")) * q)
            .cast("double")
            .alias("__prior_s"),
            # unseen-(term, class) log-prob: ln(1 / (n_tok_c + V))
            F.floor(F.log(F.lit(1.0) / (F.col("__ntok") + F.col("__v"))) * q)
            .cast("double")
            .alias("__lnp0_s"),
            (F.col("__ntok") + F.col("__v")).alias("__denom"),
        )
    )
    # per-(term, class) log-prob, quantized once per distinct pair
    lnp = counts.join(cls.select("__lbl", "__denom"), "__lbl").select(
        F.col("__lbl").alias("__mlbl"),
        "term",
        F.floor(F.log((F.col("__c") + F.lit(1.0)) / F.col("__denom")) * q)
        .cast("double")
        .alias("__lnp_s"),
    )
    # class table driver-side: k rows, the same broadcast-class
    # collect precedent as sampling.py's per-stratum counts.  Few
    # classes (the filtering regime: language/domain/quality labels)
    # take the fused one-shuffle scoring path; many classes fall back
    # to the general (doc, class)-grid form.
    cls_rows = sorted(
        (
            (r["__lbl"], float(r["__prior_s"]), float(r["__lnp0_s"]))
            for r in cls.collect()
        ),
    )
    if len(cls_rows) <= NB_PIVOT_MAX_CLASSES:
        scored = _nb_score_pivot(ex, docs_meta, lnp, cls_rows)
    else:
        scored = _nb_score_grid(ex, docs_meta, lnp, cls)
    return scored.select(
        F.col("__did").alias(id_col),
        F.col("__b.l").alias("nb_pred"),
        (-F.col("__b.ns") / q).alias("nb_logp"),
    )


#: above this many classes the fused conditional-aggregate scoring
#: (2k agg columns) stops being sensible; the grid form takes over.
NB_PIVOT_MAX_CLASSES = 64


def _nb_score_pivot(
    ex: DataFrame, docs_meta: DataFrame, lnp: DataFrame, cls_rows
) -> DataFrame:
    """One-shuffle scoring for few classes: the (token x class) join
    aggregates per DOC with one conditional (sum, count) pair per
    class — map-side combinable, no (doc, class) intermediate key —
    and the argmax folds row-locally over literal class constants."""
    j = ex.select("__did", "term").join(lnp, "term")
    aggs = []
    for i, (c, _p, _z) in enumerate(cls_rows):
        hit = F.col("__mlbl") == c
        aggs.append(F.sum(F.when(hit, F.col("__lnp_s"))).alias(f"__s{i}"))
        aggs.append(
            F.count(F.when(hit, F.lit(1))).cast("double").alias(f"__p{i}")
        )
    per_doc = j.groupBy("__did").agg(*aggs)
    # left join: a doc whose every token is model-unseen still scores
    # (all-missing contributions) — impossible when self-training but
    # reachable when scoring a held-out corpus
    scored = docs_meta.select("__did", "__n").join(per_doc, "__did", "left")
    cand = F.array(
        *[
            F.struct(
                (
                    -(
                        F.lit(prior_s)
                        + F.coalesce(F.col(f"__s{i}"), F.lit(0.0))
                        + (
                            F.col("__n")
                            - F.coalesce(F.col(f"__p{i}"), F.lit(0.0))
                        )
                        * F.lit(lnp0_s)
                    )
                ).alias("ns"),
                F.lit(c).alias("l"),
            )
            for i, (c, prior_s, lnp0_s) in enumerate(cls_rows)
        ]
    )
    return scored.select("__did", F.array_min(cand).alias("__b"))


def _nb_score_grid(
    ex: DataFrame, docs_meta: DataFrame, lnp: DataFrame, cls: DataFrame
) -> DataFrame:
    """General scoring for many classes: per-(doc, class) present-token
    sums, a broadcast docs x classes grid so classes sharing no token
    still score, and a groupBy argmax (never a window)."""
    present = (
        ex.select("__did", "term")
        .join(lnp, "term")
        .groupBy("__did", F.col("__mlbl").alias("__lbl"))
        .agg(
            F.sum("__lnp_s").alias("__sum_s"),
            F.count(F.lit(1)).cast("double").alias("__npres"),
        )
    )
    grid = (
        docs_meta.select("__did", "__n")
        .crossJoin(F.broadcast(cls.select("__lbl", "__prior_s", "__lnp0_s")))
        .join(present, ["__did", "__lbl"], "left")
        .select(
            "__did",
            "__lbl",
            (
                F.col("__prior_s")
                + F.coalesce(F.col("__sum_s"), F.lit(0.0))
                + (F.col("__n") - F.coalesce(F.col("__npres"), F.lit(0.0)))
                * F.col("__lnp0_s")
            ).alias("__score_s"),
        )
    )
    return grid.groupBy("__did").agg(
        F.min(
            F.struct((-F.col("__score_s")).alias("ns"), F.col("__lbl").alias("l"))
        ).alias("__b")
    )


def nb_sql(token_pattern: str, pfx: str = "nb") -> str:
    """DuckDB twin CTE chain ending in ``{pfx}_doc``
    (doc_id, nb_pred, nb_logp), stage-for-stage with
    :func:`nb_classify_docs` over the ``documents`` view (labels =
    ``lang``)."""
    return f"""
        {pfx}_tok AS (
            SELECT doc_id, lang,
                   regexp_extract_all(lower(text), '{token_pattern}') AS toks
            FROM documents
            WHERE len(regexp_extract_all(lower(text), '{token_pattern}')) > 0),
        {pfx}_ex AS (
            SELECT doc_id, lang, unnest(toks) AS term FROM {pfx}_tok),
        {pfx}_counts AS (
            SELECT lang, term, CAST(COUNT(*) AS DOUBLE) AS c
            FROM {pfx}_ex GROUP BY lang, term),
        {pfx}_ntok AS (
            SELECT lang, CAST(SUM(c) AS DOUBLE) AS ntok
            FROM {pfx}_counts GROUP BY lang),
        {pfx}_ndoc AS (
            SELECT lang, CAST(COUNT(*) AS DOUBLE) AS ndoc
            FROM {pfx}_tok GROUP BY lang),
        {pfx}_v AS (
            SELECT CAST(COUNT(DISTINCT term) AS DOUBLE) AS v
            FROM {pfx}_counts),
        {pfx}_nd AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS ndocs FROM {pfx}_tok),
        {pfx}_cls AS (
            SELECT t.lang,
                   floor(ln(d.ndoc / n.ndocs) * 1000000.0) AS prior_s,
                   floor(ln(1.0 / (t.ntok + v.v)) * 1000000.0) AS lnp0_s,
                   t.ntok + v.v AS denom
            FROM {pfx}_ntok t
            JOIN {pfx}_ndoc d ON d.lang = t.lang
            CROSS JOIN {pfx}_v v CROSS JOIN {pfx}_nd n),
        {pfx}_lnp AS (
            SELECT c.lang, c.term,
                   floor(ln((c.c + 1.0) / k.denom) * 1000000.0) AS lnp_s
            FROM {pfx}_counts c JOIN {pfx}_cls k ON k.lang = c.lang),
        {pfx}_present AS (
            SELECT e.doc_id, p.lang,
                   SUM(p.lnp_s) AS sum_s,
                   CAST(COUNT(*) AS DOUBLE) AS npres
            FROM {pfx}_ex e JOIN {pfx}_lnp p ON p.term = e.term
            GROUP BY e.doc_id, p.lang),
        {pfx}_grid AS (
            SELECT t.doc_id, k.lang,
                   k.prior_s + COALESCE(pr.sum_s, 0)
                   + (CAST(len(t.toks) AS DOUBLE) - COALESCE(pr.npres, 0))
                     * k.lnp0_s AS score_s
            FROM {pfx}_tok t
            CROSS JOIN {pfx}_cls k
            LEFT JOIN {pfx}_present pr
                 ON pr.doc_id = t.doc_id AND pr.lang = k.lang),
        {pfx}_doc AS (
            SELECT doc_id,
                   MIN({{'ns': -score_s, 'l': lang}})['l'] AS nb_pred,
                   -MIN({{'ns': -score_s, 'l': lang}})['ns']
                       / 1000000.0 AS nb_logp
            FROM {pfx}_grid
            GROUP BY doc_id)"""
