"""Attribution-domain schema mapped onto the driver testdata.

The reference's five SQLite tables (challenge_db_create.sql:1-43) are
projected out of the driver's ``events`` table per FIXTURES.md §2:

- ``session_sources``  <- every event (event_id -> session_id,
  event_type -> channel_name, engagement flags derived from the event
  type deterministically);
- ``session_costs``    <- events of type view/click (ad interactions
  carry cost; other sessions have no cost row -> LEFT-join gaps, the
  COALESCE path of reporting.py:64);
- ``conversions``      <- events of type purchase (value -> revenue).

The split date/time *text* columns reproduce the reference's storage
model (conv_date/conv_time, event_date/event_time — db_utils.py:173,
journey_builder.py:50); ``ts`` is the normalized timestamp column the
engine actually computes with.

``ORACLE_PRELUDE`` is the same mapping as DuckDB SQL so every operator
registered in ``__spark_entry__.queries()`` has an independently
computed oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.asof import journey_asof_join
from ..operators.ihc import ihc_attribute
from ..sources import load_table

HOLDER_TYPES = ("view", "click")
CLOSER_TYPES = ("click", "signup")
COSTED_TYPES = ("view", "click")
CONVERSION_TYPE = "purchase"


def sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_sources-shaped view of events (challenge_db_create.sql:17-27)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        F.col("event_id").cast("string").alias("session_id"),
        F.col("user_id").cast("string").alias("user_id"),
        F.col("ts"),
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
        F.date_format("ts", "HH:mm:ss").alias("event_time"),
        F.col("event_type").alias("channel_name"),
        F.col("event_type").isin(*HOLDER_TYPES).cast("int").alias("holder_engagement"),
        F.col("event_type").isin(*CLOSER_TYPES).cast("int").alias("closer_engagement"),
        (F.col("event_type") == "view").cast("int").alias("impression_interaction"),
    )


def costs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_costs-shaped view (challenge_db_create.sql:11-15).

    Only view/click sessions carry cost so the LEFT join in
    ``sessions_with_cost`` produces NULL cost rows, exercising the
    reference's COALESCE(cost, 0) path (reporting.py:64).
    """
    e = load_table(spark, sf_dir, "events")
    return e.filter(F.col("event_type").isin(*COSTED_TYPES)).select(
        F.col("event_id").cast("string").alias("session_id"),
        F.col("value").alias("cost"),
    )


def conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """conversions-shaped view (challenge_db_create.sql:1-8)."""
    e = load_table(spark, sf_dir, "events")
    return e.filter(F.col("event_type") == CONVERSION_TYPE).select(
        F.col("event_id").cast("string").alias("conv_id"),
        F.col("user_id").cast("string").alias("user_id"),
        F.col("ts").alias("conv_ts"),
        F.date_format("ts", "yyyy-MM-dd").alias("conv_date"),
        F.date_format("ts", "HH:mm:ss").alias("conv_time"),
        F.col("value").alias("revenue"),
    )


def sessions_with_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: session_sources LEFT JOIN session_costs (db_utils.py:121-125).

    ``costs`` is a strict subset of sessions → small enough to
    broadcast; at 100 TB the cost table would be co-partitioned on
    session_id instead (bucketed write), but broadcast is correct at
    any dim size under the 64 MiB threshold and AQE falls back to
    sort-merge above it.
    """
    return sessions(spark, sf_dir).join(costs(spark, sf_dir), "session_id", "left")


def journeys(
    spark: SparkSession, sf_dir: str, hot_threshold: int | None = None
) -> DataFrame:
    """J4 journey rows: sessions claimed by their earliest following
    conversion (closed form of journey_builder.py:26-115).
    ``hot_threshold``: see journey_asof_join — None keeps the
    production default; the registry gate passes a small value so the
    chunked hot-user path is itself hash-verified."""
    kw = {} if hot_threshold is None else {"hot_threshold": hot_threshold}
    return journey_asof_join(
        sessions(spark, sf_dir), conversions(spark, sf_dir), **kw
    )


def scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Journey rows + native IHC scores (operators/ihc.py)."""
    return ihc_attribute(journeys(spark, sf_dir))


#: DuckDB CTE prelude reproducing exactly the mapping above.
#: Double literals are CAST(... AS DOUBLE) so DuckDB's decimal literal
#: typing can't diverge from Spark's double arithmetic.
ORACLE_PRELUDE = """
WITH sessions AS (
    SELECT CAST(event_id AS VARCHAR) AS session_id,
           CAST(user_id AS VARCHAR)  AS user_id,
           ts,
           strftime(ts, '%Y-%m-%d')  AS event_date,
           strftime(ts, '%H:%M:%S')  AS event_time,
           event_type                AS channel_name,
           CAST(event_type IN ('view','click')   AS INT) AS holder_engagement,
           CAST(event_type IN ('click','signup') AS INT) AS closer_engagement,
           CAST(event_type = 'view'              AS INT) AS impression_interaction
    FROM events
),
costs AS (
    SELECT CAST(event_id AS VARCHAR) AS session_id, value AS cost
    FROM events
    WHERE event_type IN ('view','click')
),
conversions AS (
    SELECT CAST(event_id AS VARCHAR) AS conv_id,
           CAST(user_id AS VARCHAR)  AS user_id,
           ts                        AS conv_ts,
           strftime(ts, '%Y-%m-%d')  AS conv_date,
           strftime(ts, '%H:%M:%S')  AS conv_time,
           value                     AS revenue
    FROM events
    WHERE event_type = 'purchase'
),
sessions_with_cost AS (
    SELECT s.*, c.cost
    FROM sessions s LEFT JOIN costs c USING (session_id)
)
"""

#: J4 closed form as a DuckDB CTE (appended to ORACLE_PRELUDE).
JOURNEYS_CTE = """
journeys AS (
    SELECT session_id, user_id, ts, event_date, event_time, channel_name,
           holder_engagement, closer_engagement, impression_interaction,
           conv_id, conv_ts, revenue
    FROM (
        SELECT s.*, c.conv_id, c.conv_ts, c.revenue,
               ROW_NUMBER() OVER (PARTITION BY s.session_id
                                  ORDER BY c.conv_ts, c.conv_id) AS __rn
        FROM sessions s
        JOIN conversions c
          ON s.user_id = c.user_id AND s.ts < c.conv_ts
    ) t
    WHERE __rn = 1
)
"""

#: native IHC model as a DuckDB CTE (operators/ihc.py docstring).
SCORED_CTE = """
scored AS (
    -- __rn_desc = __n - __rn_asc + 1: (ts, session_id) is a total
    -- order, mirrored in operators/ihc.py (one window sort, not two)
    SELECT conv_id, session_id, ts, event_date, channel_name, holder_engagement,
           revenue,
           CAST(0.3 AS DOUBLE) * CAST(__rn_asc = 1 AS INT)
         + CAST(0.3 AS DOUBLE) * CAST((__n - __rn_asc + 1) = 1 AS INT)
         + CAST(0.4 AS DOUBLE) * (CASE WHEN __h > 0
               THEN CAST(holder_engagement AS DOUBLE) / CAST(__h AS DOUBLE)
               ELSE CAST(1.0 AS DOUBLE) / CAST(__n AS DOUBLE) END) AS ihc
    FROM (
        SELECT j.*,
               ROW_NUMBER() OVER (PARTITION BY conv_id
                                  ORDER BY ts, session_id) AS __rn_asc,
               SUM(holder_engagement) OVER (PARTITION BY conv_id) AS __h,
               COUNT(*) OVER (PARTITION BY conv_id) AS __n
        FROM journeys j
    ) t
)
"""


def oracle_with(*extra_ctes: str) -> str:
    """ORACLE_PRELUDE + extra CTEs, ready to prefix a SELECT."""
    return ORACLE_PRELUDE.rstrip() + "".join("," + cte for cte in extra_ctes)
