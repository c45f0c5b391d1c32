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


def test_write_bucketed_survives_orphan_location(spark, sf_dir, tmp_path):
    """Round-7 driver gate repro: the warehouse dir persists across
    processes while a fresh session's in-memory catalog starts empty,
    so a leftover managed-table directory with no catalog entry made
    saveAsTable fail with LOCATION_ALREADY_EXISTS.  write_bucketed
    must clear the orphan and succeed."""
    import os
    from urllib.parse import urlparse

    name = "b_orphan_repro"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    orphan = os.path.join(wh, name)
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "stale-file"), "w") as f:
        f.write("leftover from a killed run")
    df = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    write_bucketed(df, name, ["user_id"], 4)
    assert spark.table(name).count() == df.count()
    spark.sql(f"DROP TABLE IF EXISTS {name}")


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


def test_salted_join_matches_plain_join_exact(spark):
    """salted_join on a 90%-hot-key frame returns the exact row
    multiset of the plain join, for inner and left."""
    from haensel_ams_data_engineer_challenge_spark.operators.scale import salted_join

    big = spark.range(2000).select(
        F.col("id").alias("row_id"),
        # 90% of rows share key 1; the rest spread over 2..49; keys
        # 60+ exist on the big side only (left-join null extension)
        F.when(F.col("id") % 10 < 9, F.lit(1))
        .when(F.col("id") % 100 == 9, F.lit(60) + F.col("id") % 5)
        .otherwise(F.col("id") % 48 + 2)
        .alias("k"),
        (F.col("id") * 1.5).alias("v"),
    )
    small = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 10.0).alias("attr")
    )

    for how in ("inner", "left"):
        plain = big.join(small, "k", how)
        salted = salted_join(
            big, small, on="k", salt_source="row_id", n_salts=8, how=how
        )
        assert sorted(salted.columns) == sorted(plain.columns)
        key = lambda r: (r.k, r.row_id, r.v, r.attr)
        assert sorted(map(key, salted.collect())) == sorted(
            map(key, plain.collect())
        ), how


def test_salted_join_key_rename_and_guards(spark):
    """small_on renames the dim key; hashing the join key itself (all
    hot rows -> one salt) and non-inner/left hows are refused."""
    from haensel_ams_data_engineer_challenge_spark.operators.scale import salted_join

    big = spark.createDataFrame(
        [(1, 10, 1.0), (2, 20, 2.0), (3, 99, 3.0)], "rid: long, uid: long, v: double"
    )
    dim = spark.createDataFrame([(10, "a"), (20, "b")], "ck: long, nm: string")
    got = {
        (r.uid, r.nm)
        for r in salted_join(
            big, dim, on="uid", salt_source="rid", small_on="ck", n_salts=4
        ).collect()
    }
    assert got == {(10, "a"), (20, "b")}

    with pytest.raises(ValueError):
        salted_join(big, dim, on="uid", salt_source="uid", small_on="ck")
    with pytest.raises(ValueError):
        salted_join(big, dim, on="uid", salt_source="rid", small_on="ck", how="outer")
    with pytest.raises(ValueError):
        salted_join(big, dim, on="uid", salt_source="rid", small_on="ck", n_salts=0)


def test_salted_join_shuffles_on_key_and_salt(spark):
    """With broadcast off (the too-big-to-broadcast regime this
    operator exists for), the join's exchanges partition on
    (key, __salt) — the hot key spreads over n_salts reducers."""
    from haensel_ams_data_engineer_challenge_spark.operators.scale import salted_join

    # hot key must be data-dependent: a literal would be constant-
    # folded out of the join keys entirely
    big = spark.range(1000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") < 900, F.lit(1)).otherwise(F.col("id") % 4).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.range(4).select(F.col("id").alias("k"), F.col("id").alias("a"))
    thr = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(thr)
    spark.conf.set(thr, "-1")
    try:
        df = salted_join(big, small, on="k", salt_source="row_id", n_salts=8)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(thr, old)
    import re

    exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    both = [x for x in exchanges if "k#" in x and "__salt#" in x]
    assert len(both) >= 2, plan  # both join inputs partition on (k, __salt)


def test_aqe_splits_skewed_smj_partition(spark):
    """DESIGN.md trusts AQE with skew-join splitting for sort-merge
    joins; pin that the trust is real: with skew thresholds scaled to
    a local frame, a 95%-hot-key SMJ's final adaptive plan shows the
    skew=true split instead of one flooded reducer partition.
    (Salting — salted_join/salted_sum — remains for KNOWN skew and
    skewed aggregates, which AQE does not split.)"""
    # pad must be INCOMPRESSIBLE (unique per row): AQE measures
    # compressed shuffle bytes, and a constant pad deflates to nothing
    pad = F.repeat(F.md5(F.col("id").cast("string")), 8)
    big = spark.range(4000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 20 < 19, F.lit(1)).otherwise(F.col("id") % 7).alias("k"),
        pad.alias("pad"),
    )
    other = spark.range(70).select(
        (F.col("id") % 7).alias("k"), pad.alias("pad2")
    )
    expected = big.join(other, "k").count()  # default confs
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        df = big.join(other, "k")
        # collect() executes THIS df's QueryExecution — count() or a
        # writer would finalize a different one and leave this plan
        # isFinalPlan=false (the frames above are sized so the joined
        # result is small enough to ship)
        n = len(df.collect())
        assert n == expected  # split changes nothing semantically
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
