"""As-of join — the engine's flagship custom operator.

Reference semantics (journey_builder.build_customer_journeys:26-115):
each session is matched to a conversion of the same user whose
timestamp is strictly after the session's, and each session is claimed
by at most one conversion, earliest-conversion-first (conversions
iterated in conv_ts order, sessions accumulated into
``assigned_session_ids``, journey_builder.py:48-52, 92-107).

Closed form: session -> the EARLIEST conversion of that user with
``conv_ts > session_ts``. That makes the sequential greedy loop a
*reverse as-of join*, expressible as a non-equi join plus a pick-first
window — no driver-side loop, fully distributed.

Physical plan at scale: the equi part (``user_id``) runs as a
shuffle/broadcast hash join with the ``<`` theta as a post-filter.
Per-user cardinalities are small (a user has few conversions), so the
join fan-out is bounded; hot users are the skew risk and AQE skew-join
splitting handles them (session.py ENGINE_CONFS). The follow-up
window partitions by the *left key* (session_id — unique, perfectly
spread), so no second skew point exists.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_on: str,
    right_on: str,
    left_key: Sequence[str],
    direction: str = "forward",
    allow_exact: bool = False,
    tie_cols: Sequence[str] = (),
    how: str = "inner",
) -> DataFrame:
    """Generic distributed as-of join.

    For every left row, keep the single right row (sharing the ``by``
    keys) whose ``right_on`` is nearest to ``left_on`` in ``direction``:
    ``forward`` -> earliest right with right_on > left_on (>= when
    ``allow_exact``), ``backward`` -> latest right with right_on <
    left_on. ``left_key`` must uniquely identify left rows (the window
    partition). ``how='left'`` keeps unmatched left rows with NULLs.
    """
    if direction not in ("forward", "backward"):
        raise ValueError(f"direction must be forward|backward, got {direction!r}")
    l, r = left.alias("l"), right.alias("r")
    cond: Column | None = None
    for k in by:
        c = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = c if cond is None else (cond & c)
    lo, ro = F.col(f"l.{left_on}"), F.col(f"r.{right_on}")
    if direction == "forward":
        rng = (ro >= lo) if allow_exact else (ro > lo)
        order = [F.col(f"r.{right_on}").asc()] + [F.col(f"r.{c}").asc() for c in tie_cols]
    else:
        rng = (ro <= lo) if allow_exact else (ro < lo)
        order = [F.col(f"r.{right_on}").desc()] + [F.col(f"r.{c}").desc() for c in tie_cols]
    cond = rng if cond is None else (cond & rng)

    joined = l.join(r, on=cond, how="inner")
    w = Window.partitionBy(*[F.col(f"l.{k}") for k in left_key]).orderBy(*order)
    picked = joined.withColumn("__asof_rn", F.row_number().over(w)).filter(
        F.col("__asof_rn") == 1
    ).drop("__asof_rn")
    # de-duplicate the by-columns (keep the left copy)
    out = picked.select(
        *[F.col(f"l.{c}") for c in left.columns],
        *[F.col(f"r.{c}").alias(c) for c in right.columns if c not in by],
    )
    if how == "left":
        matched_keys = out.select(*[F.col(k) for k in left_key])
        missing = left.join(matched_keys, list(left_key), "left_anti")
        for c in right.columns:
            if c not in by:
                missing = missing.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
        out = out.unionByName(missing)
    return out


def journey_asof_join(sessions: DataFrame, conversions: DataFrame) -> DataFrame:
    """J4: build journey rows (SURVEY.md §2.3) — merged-stream form.

    Output: one row per (conv_id, session_id) — every session of the
    journey of the conversion that claimed it, carrying session
    attributes + conv_ts/revenue. Conversions with zero prior sessions
    simply produce no rows (reference drops them with a warning,
    journey_builder.py:87-89). Ties between conversions at the same
    conv_ts break on conv_id (reference processes earliest-first and
    pandas sort is stable; conv_id gives Spark a deterministic total
    order).

    Instead of the generic join+window (which materializes
    |sessions x later-conversions| intermediate rows — measured ~7x
    the input at sf0.1 and growing with conversions-per-user), union
    the two streams and scan each user's timeline once, latest-first,
    carrying the running "earliest conversion seen so far":

    - order: ts DESC, sessions-before-conversions on ties (so a
      conversion at the exact session ts is invisible -> strict <,
      journey_builder.py:84), conv_id DESC (so the running value ends
      at the MIN conv_id for equal conv_ts);
    - ``last(conv_id, ignorenulls)`` over unbounded-preceding..current
      is then exactly "earliest conversion strictly after this
      session".

    Cost: one shuffle+sort of |sessions|+|conversions| rows on
    user_id — linear, no fan-out. Per-user timelines are bounded in
    practice; a pathological hot user is a single sorted partition
    (same bound as any per-entity sessionization).
    """
    s = sessions.select(
        "session_id", "user_id", "ts", "event_date", "event_time",
        "channel_name", "holder_engagement", "closer_engagement",
        "impression_interaction",
        F.lit(0).alias("__is_conv"),
        F.lit(None).cast("string").alias("conv_id"),
        F.lit(None).cast(dict(conversions.dtypes)["conv_ts"]).alias("conv_ts"),
        F.lit(None).cast("double").alias("revenue"),
    )
    c = conversions.select(
        F.lit(None).cast("string").alias("session_id"),
        "user_id",
        F.col("conv_ts").alias("ts"),
        F.lit(None).cast("string").alias("event_date"),
        F.lit(None).cast("string").alias("event_time"),
        F.lit(None).cast("string").alias("channel_name"),
        F.lit(None).cast("int").alias("holder_engagement"),
        F.lit(None).cast("int").alias("closer_engagement"),
        F.lit(None).cast("int").alias("impression_interaction"),
        F.lit(1).alias("__is_conv"),
        "conv_id",
        "conv_ts",
        "revenue",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("__is_conv").asc(), F.col("conv_id").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = s.unionByName(c).select(
        "*",
        F.last("conv_id", ignorenulls=True).over(w).alias("__next_conv"),
        F.last("conv_ts", ignorenulls=True).over(w).alias("__next_conv_ts"),
        F.last("revenue", ignorenulls=True).over(w).alias("__next_revenue"),
    )
    return (
        merged.filter((F.col("__is_conv") == 0) & F.col("__next_conv").isNotNull())
        .select(
            "session_id", "user_id", "ts", "event_date", "event_time",
            "channel_name", "holder_engagement", "closer_engagement",
            "impression_interaction",
            F.col("__next_conv").alias("conv_id"),
            F.col("__next_conv_ts").alias("conv_ts"),
            F.col("__next_revenue").alias("revenue"),
        )
    )


def journey_asof_join_naive(sessions: DataFrame, conversions: DataFrame) -> DataFrame:
    """J4 via the generic join+window closed form — kept as the
    independent cross-check for the merged-stream implementation
    (tests assert both produce identical assignments)."""
    return asof_join(
        sessions,
        conversions.select("conv_id", "user_id", "conv_ts", "revenue"),
        by=["user_id"],
        left_on="ts",
        right_on="conv_ts",
        left_key=["session_id"],
        direction="forward",
        allow_exact=False,  # strict <, journey_builder.py:84
        tie_cols=["conv_id"],
    )
