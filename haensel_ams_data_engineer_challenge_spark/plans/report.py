"""Channel reporting plan (reference reporting.py, SURVEY.md §2.4/§3).

One lazy DataFrame graph replaces the reference's eager
DELETE + INSERT...SELECT + pandas post-processing
(reporting.py:34-189): the 4-table join (J1+J2+J3) feeds the grouped
aggregate (A1), the CPO/ROAS metrics (C6/C7) and the final sort (W4).
Catalyst broadcast-joins the small sides and pushes the date filter
into every parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.scalars import dsum, safe_div


def channel_report(
    sessions: DataFrame,
    costs: DataFrame,
    attribution: DataFrame,
    conversions: DataFrame,
    start_date: str | None = None,
    end_date: str | None = None,
) -> DataFrame:
    """A1: per (channel_name, date) cost / ihc / ihc_revenue
    (reporting.py:53-91).

    ``attribution`` is (conv_id, session_id, ihc) as produced by
    ``ihc_attribute``. The date filter (F1, inclusive bounds,
    reporting.py:78-85) is applied on the session side so it pushes
    down to the events scan.
    """
    s = sessions
    if start_date:
        s = s.filter(F.col("event_date") >= start_date)
    if end_date:
        s = s.filter(F.col("event_date") <= end_date)
    joined = (
        s.join(costs, "session_id", "left")  # J1
        .join(attribution.select("conv_id", "session_id", "ihc"), "session_id", "inner")  # J2
        .join(conversions.select("conv_id", "revenue"), "conv_id", "inner")  # J3
    )
    return (
        joined.groupBy("channel_name", F.col("event_date").alias("date"))
        .agg(
            dsum(F.coalesce(F.col("cost"), F.lit(0.0)), "cost"),
            dsum("ihc", "ihc"),
            dsum(F.col("ihc") * F.col("revenue"), "ihc_revenue"),
        )
    )


def channel_report_fused(
    scored_journeys: DataFrame,
    costs: DataFrame,
    start_date: str | None = None,
    end_date: str | None = None,
) -> DataFrame:
    """A1, fused form: scored journey rows already carry channel_name /
    event_date / revenue (the as-of join brought them along), so only
    the cost side needs a join — two event scans and two joins fewer
    than the generic form. Used when scoring and reporting run in one
    plan; the generic ``channel_report`` remains for reporting over an
    attribution SINK (which stores only conv_id/session_id/ihc)."""
    a = scored_journeys
    if start_date:
        a = a.filter(F.col("event_date") >= start_date)
    if end_date:
        a = a.filter(F.col("event_date") <= end_date)
    return (
        a.join(costs, "session_id", "left")
        .groupBy("channel_name", F.col("event_date").alias("date"))
        .agg(
            dsum(F.coalesce(F.col("cost"), F.lit(0.0)), "cost"),
            dsum("ihc", "ihc"),
            dsum(F.col("ihc") * F.col("revenue"), "ihc_revenue"),
        )
    )


def report_metrics(report: DataFrame) -> DataFrame:
    """C6/C7 + W4: CPO/ROAS with NULL on zero divisor, sorted output
    (reporting.py:146-161)."""
    return (
        report.withColumn("CPO", safe_div(F.col("cost"), F.col("ihc")))
        .withColumn("ROAS", safe_div(F.col("ihc_revenue"), F.col("cost")))
        .orderBy("channel_name", "date")
    )


def report_totals(report: DataFrame) -> DataFrame:
    """A5: grand totals + overall ROAS with zero-guard
    (reporting.py:171-179), fused with A6's row count
    (reporting.py:95-96) — one aggregation row carries both."""
    return report.agg(
        dsum("cost", "total_cost"),
        dsum("ihc_revenue", "total_ihc_revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    ).select(
        "total_cost",
        "total_ihc_revenue",
        safe_div(F.col("total_ihc_revenue"), F.col("total_cost")).alias("overall_roas"),
        "n_rows",
    )
