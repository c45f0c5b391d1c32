"""Domain-blocklist filter: label-boundary suffix semantics, join ==
expression form, broadcast shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from haensel_ams_data_engineer_challenge_spark.operators.blocklist import (
    blocklist_flag,
    blocklist_flag_expr,
    host_suffixes,
)

DOCS = [
    (1, "ads.example.com"),        # exact entry
    (2, "x.ads.example.com"),      # subdomain of entry
    (3, "badads.example.com"),     # NOT blocked: label boundary
    (4, "example.com"),            # parent of entry: not blocked
    (5, "Tracker.NET"),            # case-insensitive exact
    (6, "safe.org"),
    (7, "deep.sub.tracker.net"),   # subdomain, depth 2
]
BLOCKED = ["ads.example.com", "tracker.net"]


def test_suffix_chain(spark):
    df = spark.createDataFrame([("A.b.C",)], "h string")
    got = df.select(host_suffixes("h").alias("s")).collect()[0]["s"]
    assert got == ["a.b.c", "b.c", "c"]


def test_label_boundary_blocking_join_form(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, source string")
    bl = spark.createDataFrame([(h,) for h in BLOCKED], "host string")
    got = {r["doc_id"]: r["blocked"]
           for r in blocklist_flag(docs, bl).collect()}
    assert got == {1: True, 2: True, 3: False, 4: False,
                   5: True, 6: False, 7: True}


def test_expression_form_equals_join_form(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, source string")
    bl = spark.createDataFrame([(h,) for h in BLOCKED], "host string")
    join_rows = sorted(
        (r["doc_id"], r["blocked"])
        for r in blocklist_flag(docs, bl).collect()
    )
    expr_rows = sorted(
        (r["doc_id"], r["blocked"])
        for r in docs.select(
            "doc_id", blocklist_flag_expr(BLOCKED).alias("blocked")
        ).collect()
    )
    assert join_rows == expr_rows


def test_blocklist_is_broadcast(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, source string")
    bl = spark.createDataFrame([(h,) for h in BLOCKED], "host string")
    plan = blocklist_flag(docs, bl)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
