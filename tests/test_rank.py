"""Distributed order statistics: global_row_number and exact NTILE."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from haensel_ams_data_engineer_challenge_spark.operators.rank import (
    global_row_number,
    ntile_exact,
)


def _df(spark, n=97, parts=7):
    # value deliberately collides (v = id % 13) so the doc_id
    # tie-break is load-bearing
    return (
        spark.range(n).repartition(parts)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 13).cast("double").alias("v"),
        )
    )


def test_global_row_number_matches_single_window(spark):
    df = _df(spark)
    got = {
        r["doc_id"]: r["global_rn"]
        for r in global_row_number(df, ["v", "doc_id"]).collect()
    }
    exp_rows = sorted(df.collect(), key=lambda r: (r["v"], r["doc_id"]))
    exp = {r["doc_id"]: i + 1 for i, r in enumerate(exp_rows)}
    assert got == exp


def test_global_row_number_partitioning_invariance(spark):
    df1 = _df(spark, parts=1)
    df9 = _df(spark, parts=9)
    a = sorted(
        (r["doc_id"], r["global_rn"])
        for r in global_row_number(df1, ["v", "doc_id"]).collect()
    )
    b = sorted(
        (r["doc_id"], r["global_rn"])
        for r in global_row_number(df9, ["v", "doc_id"]).collect()
    )
    assert a == b


@pytest.mark.parametrize("n,q", [(97, 3), (10, 3), (2, 5), (30, 1), (5, 5)])
def test_ntile_matches_duckdb(spark, n, q):
    df = _df(spark, n=n)
    got = {
        r["doc_id"]: r["bucket"]
        for r in ntile_exact(df, q, ["v", "doc_id"]).collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE t AS "
        + " UNION ALL ".join(
            f"SELECT {i} AS doc_id, CAST({i % 13} AS DOUBLE) AS v"
            for i in range(n)
        )
    )
    exp = {
        r[0]: r[1]
        for r in con.sql(
            f"SELECT doc_id, NTILE({q}) OVER (ORDER BY v, doc_id) FROM t"
        ).fetchall()
    }
    assert got == exp


def test_ntile_rejects_bad_q(spark):
    with pytest.raises(ValueError):
        ntile_exact(_df(spark), 0, ["v", "doc_id"])


def test_rank_windows_all_carry_pid_or_are_bounded(spark):
    """No window in the plan partitions over the raw relation: local
    ranks carry __pid; the offset window is global but runs over the
    per-partition totals (<= n_partitions rows)."""
    df = _df(spark)
    plan = (
        ntile_exact(df, 3, ["v", "doc_id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs
    for s in specs:
        # either partitioned by __pid (bounded local) or ordering
        # __pid rows (the n_partitions-row offset window)
        assert "__pid" in s, s


def test_grouped_exact_percentiles_match_percentile_agg(spark):
    """The rank-based exact percentiles agree with Spark's
    `percentile` aggregate (same linear-interpolation statistic)
    on tie-heavy groups of co-prime sizes."""
    from haensel_ams_data_engineer_challenge_spark.operators.rank import (
        grouped_exact_percentiles,
    )

    rows = []
    for gi, size in enumerate([1, 2, 7, 30]):
        rows += [(f"g{gi}", i, float((i * 13) % 11)) for i in range(size)]
    df = spark.createDataFrame(rows, "grp string, k long, value double")
    exp = {
        r["grp"]: r
        for r in df.groupBy("grp").agg(
            F.percentile("value", 0.5).alias("median_value"),
            F.percentile("value", 0.9).alias("p90_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        ).collect()
    }
    got = {
        r["grp"]: r
        for r in grouped_exact_percentiles(
            df, ["grp"], "value", "k",
            {"median_value": 0.5, "p90_value": 0.9},
        ).collect()
    }
    assert set(got) == set(exp)
    for g in exp:
        for c in ("median_value", "p90_value", "min_value", "max_value"):
            assert abs(got[g][c] - exp[g][c]) < 1e-12, (g, c)


def test_grouped_exact_percentiles_partitioning_invariance(spark):
    from haensel_ams_data_engineer_challenge_spark.operators.rank import (
        grouped_exact_percentiles,
    )

    rows = [(f"g{i % 3}", i, float(i % 5)) for i in range(40)]
    a = spark.createDataFrame(rows, "grp string, k long, value double").coalesce(1)
    b = spark.createDataFrame(rows, "grp string, k long, value double").repartition(8)
    ra = sorted(map(tuple, grouped_exact_percentiles(
        a, ["grp"], "value", "k", {"p50": 0.5}).collect()))
    rb = sorted(map(tuple, grouped_exact_percentiles(
        b, ["grp"], "value", "k", {"p50": 0.5}).collect()))
    assert ra == rb
