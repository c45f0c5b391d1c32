"""Gap-based sessionization (training-data pipeline tier).

Assigns every event to a session: a new session starts when the gap to
the user's previous event exceeds ``gap_seconds``. Classic lag + running
sum of boundary flags — two window passes over one user_id shuffle, no
state, no UDFs.

Gap comparison contract (shared with the DuckDB oracle): timestamps are
truncated to epoch seconds BEFORE differencing (Spark unix_timestamp
and DuckDB epoch()::BIGINT truncate identically), so both engines agree
on boundaries even for sub-second gaps around the threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

DEFAULT_GAP_SECONDS = 1800


def sessionize(
    events: DataFrame,
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Input events + ``session_key`` (user-scoped running session #)."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    epoch = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    prev = F.lag(epoch).over(w)
    is_new = (prev.isNull() | ((epoch - prev) > gap_seconds)).cast("int")
    running = F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return events.withColumn(
        "session_key",
        F.concat_ws("-", F.col(user_col).cast("string"), running.cast("string")),
    )


def session_stats(sessionized: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Per-session rollup: span, event count, value sum."""
    from ..functions.scalars import dsum

    return sessionized.groupBy("session_key", user_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        dsum("value", "total_value"),
    )
