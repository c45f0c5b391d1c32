"""Watermarked stream-stream join: attribute purchases to the clicks
that preceded them within an attribution window.

This is the streaming form of the J4-lite "touch before conversion"
problem: both sides are unbounded, so Spark buffers each side's rows
only until the watermark + interval bound passes — state is bounded by
(watermark horizon x arrival rate), the textbook stream-stream
interval join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def clicks_to_purchases(
    events: DataFrame,
    attribution_window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Pairs (click, purchase) of the same user with
    click.ts <= purchase.ts <= click.ts + attribution_window.

    Output: user_id, click_id, click_ts, purchase_id, purchase_ts,
    revenue. Works on a streaming OR batch events frame — the same
    join expression, which is exactly the point (tests run both and
    compare).
    """
    is_streaming = events.isStreaming
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("revenue"),
    )
    if is_streaming:
        clicks = clicks.withWatermark("click_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {attribution_window}"))
    )
    return clicks.join(purchases, cond, "inner").select(
        F.col("c_user").alias("user_id"),
        "click_id", "click_ts", "purchase_id", "purchase_ts", "revenue",
    )
