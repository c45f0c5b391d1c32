"""BM25 retrieval: ranking semantics, self-exclusion, oracle bit-parity."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from haensel_ams_data_engineer_challenge_spark.operators.retrieval import (
    bm25_sql,
    bm25_topk,
    search_tokens,
)

DOCS = [
    # (doc_id, text)
    (1, "spark shuffles data between executors during wide transformations"),
    (2, "broadcast joins avoid shuffles when one side is small"),
    (3, "the quick brown fox jumps over the lazy dog"),
    (4, "spark broadcast variables ship small lookup tables to executors"),
    (5, "completely unrelated text about cooking pasta with tomato sauce"),
    (6, "shuffles shuffles shuffles shuffles shuffles shuffles shuffles"),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_bm25_retrieves_source_doc_first(spark):
    docs = _docs_df(spark)
    queries = spark.createDataFrame(
        [(100, "broadcast joins avoid shuffles")], "query_id long, text string"
    )
    res = bm25_topk(docs, queries, k=3, exclude_self=False).collect()
    assert res[0]["doc_id"] == 2  # contains every query term
    assert res[0]["n_matched"] == 4
    assert [r["rank"] for r in res] == [1, 2, 3]
    scores = [r["score"] for r in res]
    assert scores == sorted(scores, reverse=True)


def test_bm25_excludes_self_when_query_is_a_doc(spark):
    docs = _docs_df(spark)
    queries = spark.createDataFrame(
        [(2, "broadcast joins avoid shuffles when one side is small")],
        "query_id long, text string",
    )
    with_self = bm25_topk(docs, queries, k=3, exclude_self=False).collect()
    without = bm25_topk(docs, queries, k=3, exclude_self=True).collect()
    assert with_self[0]["doc_id"] == 2
    assert all(r["doc_id"] != 2 for r in without)


def test_bm25_tf_saturates_not_linear(spark):
    """Doc 6 (7x 'shuffles') must not beat doc 2 on a multi-term query:
    BM25's tf saturation caps the repeated-term contribution."""
    docs = _docs_df(spark)
    queries = spark.createDataFrame(
        [(100, "broadcast joins avoid shuffles")], "query_id long, text string"
    )
    res = bm25_topk(docs, queries, k=6, exclude_self=False).collect()
    by_id = {r["doc_id"]: r for r in res}
    assert by_id[2]["score"] > by_id[6]["score"]


def test_bm25_no_match_no_rows(spark):
    docs = _docs_df(spark)
    queries = spark.createDataFrame(
        [(100, "zzzunknown qqqterms")], "query_id long, text string"
    )
    assert bm25_topk(docs, queries, k=3).count() == 0


@pytest.mark.parametrize("sfn", ["sf0.001", "sf0.01"])
def test_bm25_oracle_bit_parity(spark, sfn):
    """Spark scores are BIT-equal to the DuckDB twin (idf floor
    quantization removes the 1-ulp ln() divergence — module docstring)."""
    sf = f"/root/testdata/{sfn}"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    queries = docs.filter("doc_id % 25 = 0").select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", F.slice(search_tokens("text"), 1, 16)).alias("text"),
    )
    res = (
        bm25_topk(docs, queries, k=5)
        .orderBy("query_id", "rank")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    qcte = (
        "SELECT doc_id AS query_id, "
        "array_to_string((regexp_extract_all(lower(text), '[a-z0-9]+'))[1:16], ' ') AS qtext "
        "FROM documents WHERE doc_id % 25 = 0"
    )
    ora = con.sql(
        "WITH " + bm25_sql(qcte).strip() + "\nSELECT * FROM bm_topk ORDER BY query_id, rank"
    ).df()
    assert len(res) == len(ora) > 0
    assert (res["doc_id"].values == ora["doc_id"].values).all()
    assert (res["n_matched"].values == ora["n_matched"].values).all()
    assert (res["score"].values == ora["score"].values).all()  # bitwise


def test_bm25_max_df_prunes_common_terms(spark):
    """With max_df_frac below a term's df/N the term stops scoring:
    'shuffles' (3/6 docs, inclusive cap) is pruned at 0.4, kept at
    0.9 — and the oracle twin applies the identical cap."""
    docs = _docs_df(spark)
    queries = spark.createDataFrame(
        [(100, "broadcast shuffles")], "query_id long, text string"
    )
    capped = bm25_topk(docs, queries, k=6, exclude_self=False,
                       max_df_frac=0.4).collect()
    uncapped = bm25_topk(docs, queries, k=6, exclude_self=False,
                         max_df_frac=0.9).collect()
    # 'shuffles' pruned: docs 1 and 6 (shuffles-only) drop out entirely
    assert {r["doc_id"] for r in capped} == {2, 4}
    assert all(r["n_matched"] == 1 for r in capped)
    assert {r["doc_id"] for r in uncapped} == {1, 2, 4, 6}


def test_bm25_max_df_oracle_parity(spark):
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    queries = docs.filter("doc_id % 25 = 0").select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", F.slice(search_tokens("text"), 1, 16)).alias("text"),
    )
    res = (
        bm25_topk(docs, queries, k=5, max_df_frac=0.999)
        .orderBy("query_id", "rank").toPandas()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    qcte = (
        "SELECT doc_id AS query_id, "
        "array_to_string((regexp_extract_all(lower(text), '[a-z0-9]+'))[1:16], ' ') AS qtext "
        "FROM documents WHERE doc_id % 25 = 0"
    )
    ora = con.sql(
        "WITH " + bm25_sql(qcte, max_df_frac=0.999).strip()
        + "\nSELECT * FROM bm_topk ORDER BY query_id, rank"
    ).df()
    assert len(res) == len(ora) > 0
    assert (res["doc_id"].values == ora["doc_id"].values).all()
    assert (res["score"].values == ora["score"].values).all()


def test_bm25_plan_broadcasts_small_sides(spark):
    """The vocab prune, idf and query-term joins must all broadcast —
    the corpus-side posting stream is the only shuffled relation."""
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    queries = docs.filter("doc_id % 25 = 0").select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", F.slice(search_tokens("text"), 1, 16)).alias("text"),
    )
    plan = bm25_topk(docs, queries, k=5)._jdf.queryExecution().executedPlan().toString()
    # the vocab-prune join sits behind the materialize() lineage cut,
    # so the final plan shows the idf + query-term broadcasts plus the
    # 1-row stats broadcast cross join — and nothing shuffle-joined
    assert plan.count("BroadcastHashJoin") >= 2
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # 1-row stats
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
