"""Native IHC (Initializer–Holder–Closer) attribution scoring.

The reference scores journeys by POSTing them to the external IHC API
(api_utils.IHCApiClient.compute_ihc:68-138) and only *validates* the
result shape: per-session ihc in [0,1] (api_utils.py:270-271) summing
to 1.0 +- 0.001 per conversion (db_utils.check_attribution_sums:227-258).
The engine implements the scoring natively as a deterministic,
window-expressible model honouring the published IHC structure — the
conversion's credit is split across three phases:

- Initializer  W_I = 0.3 -> the journey's first session (min ts);
- Closer       W_C = 0.3 -> the journey's last session (max ts);
- Holder       W_H = 0.4 -> spread over sessions with
  ``holder_engagement = 1`` proportionally; if the journey has no
  holder-engaged session, spread evenly over all sessions.

A single-session journey receives all three phases = 1.0. The output
satisfies the reference's invariants by construction (ihc in [0,1],
per-conversion sum = 1 within fp rounding), which the engine re-checks
with ``attribution_sum_violations`` (A2).

Everything is window functions over ``partitionBy(conv_id)`` — pure
Catalyst, whole-stage-codegen'd, one shuffle on conv_id. The
journey-sized groups are tiny, so no skew risk. An
``applyInPandas`` variant is not needed: the model is closed-form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

W_INITIALIZER = 0.3
W_HOLDER = 0.4
W_CLOSER = 0.3


def _journey_windows(conv_col: str, ts_col: str, session_col: str):
    by_conv = Window.partitionBy(conv_col)
    asc = by_conv.orderBy(F.col(ts_col).asc(), F.col(session_col).asc())
    desc = by_conv.orderBy(F.col(ts_col).desc(), F.col(session_col).desc())
    return by_conv, asc, desc


def flag_conversion_session(
    journeys: DataFrame,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    session_col: str = "session_id",
    flag_col: str = "conversion",
) -> DataFrame:
    """W3: mark exactly one session per journey as the converting one.

    Reference: the latest session with ts <= conv_ts gets conversion=1
    (journey_builder.py:136-156, argmax via idxmax). Journey membership
    is already strict (< conv_ts), so the flag is simply the journey's
    latest session; ties on identical ts break on session_id, mirroring
    pandas idxmax's deterministic first-max.
    """
    _, _, desc = _journey_windows(conv_col, ts_col, session_col)
    return journeys.withColumn(
        flag_col, (F.row_number().over(desc) == 1).cast("int")
    )


def ihc_attribute(
    journeys: DataFrame,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    session_col: str = "session_id",
    holder_col: str = "holder_engagement",
) -> DataFrame:
    """Score journey rows with the native IHC model (module docstring).

    Input: one row per (conv_id, session_id) as produced by
    ``journey_asof_join``. Output: input columns + ``ihc`` double.
    """
    by_conv, asc, _desc = _journey_windows(conv_col, ts_col, session_col)
    rn_asc = F.row_number().over(asc)
    holder_sum = F.sum(holder_col).over(by_conv)
    n = F.count(F.lit(1)).over(by_conv)
    # (ts, session_id) is a total order within a journey, so the
    # descending rank is derivable: one window SORT instead of two
    # (the unordered aggregates share the same exchange regardless).
    rn_desc = n - rn_asc + 1
    holder_share = F.when(
        holder_sum > 0, F.col(holder_col).cast("double") / holder_sum.cast("double")
    ).otherwise(F.lit(1.0) / n.cast("double"))
    ihc = (
        F.lit(W_INITIALIZER) * (rn_asc == 1).cast("int").cast("double")
        + F.lit(W_CLOSER) * (rn_desc == 1).cast("int").cast("double")
        + F.lit(W_HOLDER) * holder_share
    )
    return journeys.withColumn("ihc", ihc)


def attribution_sum_violations(
    attribution: DataFrame,
    conv_col: str = "conv_id",
    ihc_col: str = "ihc",
    tolerance: float = 0.001,
) -> DataFrame:
    """A2: conversions whose ihc does not sum to 1 +- tolerance
    (db_utils.check_attribution_sums:227-258)."""
    return (
        attribution.groupBy(conv_col)
        .agg(F.sum(ihc_col).alias("ihc_sum"))
        .filter(F.abs(F.col("ihc_sum") - 1.0) > tolerance)
    )
