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
    """J4: build journey rows (SURVEY.md §2.3).

    Output: one row per (conv_id, session_id) — every session of the
    journey of the conversion that claimed it, carrying session
    attributes + conv_ts/revenue. Conversions with zero prior sessions
    simply produce no rows (reference drops them with a warning,
    journey_builder.py:87-89). Ties between conversions at the same
    conv_ts break on conv_id (reference processes earliest-first and
    pandas sort is stable; conv_id gives Spark a deterministic total
    order).
    """
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
