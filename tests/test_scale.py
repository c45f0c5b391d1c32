"""Scale utilities: bucketed joins must drop the exchange; salted
aggregation must be bit-identical to the plain one."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from haensel_ams_data_engineer_challenge_spark.functions.scalars import dsum
from haensel_ams_data_engineer_challenge_spark.operators.scale import (
    bucketed_join,
    salted_sum,
    write_bucketed,
)
from haensel_ams_data_engineer_challenge_spark.sources import load_table


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    sessions = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    convs = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select(F.col("event_id").alias("conv_event"), "user_id")
    write_bucketed(sessions, "b_sessions", ["user_id"], 8)
    write_bucketed(convs, "b_convs", ["user_id"], 8)
    joined = bucketed_join(spark, "b_sessions", "b_convs", ["user_id"])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, "bucketed join must not shuffle"
    # and it returns the same rows as the unbucketed join
    expected = sessions.join(convs, "user_id").count()
    assert joined.count() == expected


def test_salted_sum_matches_plain_sum_bitwise(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plain = {
        r.event_type: r.total
        for r in ev.groupBy("event_type").agg(dsum("value", "total")).collect()
    }
    salted = {
        r.event_type: r.sum_value
        for r in salted_sum(ev, "event_type", "value", n_salts=16, salt_source="event_id").collect()
    }
    assert salted == plain  # exact equality, not approx


def test_salted_sum_two_exchanges(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    df = salted_sum(ev, "event_type", "value", n_salts=16, salt_source="event_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2  # salted + final


def test_kmv_distinct_estimate_accuracy_and_determinism(spark):
    """KMV approx-distinct: within the ~1/sqrt(k-2) error envelope of
    the exact count, exact below k, and bit-identical across input
    partitionings (the property that lets it hash-check in a driver
    row where HLL cannot)."""
    from haensel_ams_data_engineer_challenge_spark.operators.scale import (
        kmv_distinct_estimate,
    )

    n = 5000
    df = spark.range(n).select((F.col("id") % 1000).cast("string").alias("u"))
    k = 64
    est = kmv_distinct_estimate(df, "u", k=k).first().approx_distinct
    assert abs(est - 1000) / 1000 < 3.0 / (k - 2) ** 0.5, est

    # repartitioned input -> identical estimate (order-independent)
    est2 = (
        kmv_distinct_estimate(df.repartition(13, "u"), "u", k=k)
        .first()
        .approx_distinct
    )
    assert est2 == est

    # fewer than k distinct values -> exact count
    small = spark.range(10).select(F.col("id").cast("string").alias("u"))
    assert kmv_distinct_estimate(small, "u", k=k).first().approx_distinct == 10.0


def test_kmv_empty_input_is_zero(spark):
    from haensel_ams_data_engineer_challenge_spark.operators.scale import (
        kmv_distinct_estimate,
    )

    empty = spark.createDataFrame([], "u string")
    assert kmv_distinct_estimate(empty, "u").first().approx_distinct == 0.0
