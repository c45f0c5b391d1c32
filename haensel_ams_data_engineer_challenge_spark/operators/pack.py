"""P2 chunk packing (reference journey_builder.chunk_journeys:183-239).

The reference packs journeys into chunks of <= 100 journeys AND <= 200
sessions, never splitting a journey across chunks, by a sequential
greedy loop. Two engine forms:

- ``pack_groups_cumsum`` — deterministic CLOSED FORM: running
  journey/session counts over a total order, chunk id =
  greatest(cum_journeys div J, cum_sessions div S). Guarantees
  <= J journeys per chunk and bounds sessions to < S + max journey
  size (a single oversized journey still gets its own chunk, like the
  reference). Fully window-expressible -> has a SQL oracle. The
  single-partition window is inherently sequential — at scale you pack
  WITHIN a date/tenant partition (add it to the partitionBy), which is
  also what an API-request packer would want.

- ``pack_groups_greedy`` — EXACT reference semantics (close the chunk
  when adding the next journey would exceed either cap) via a plain
  Python greedy inside one ``applyInPandas`` group; verified in
  tests/test_pack.py against an independent in-memory implementation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..attribution import model as M

MAX_JOURNEYS = 100
MAX_SESSIONS = 200


def journey_sizes(journeys: DataFrame) -> DataFrame:
    return journeys.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_sessions"))


def pack_cumsum(
    sizes: DataFrame,
    max_journeys: int = MAX_JOURNEYS,
    max_sessions: int = MAX_SESSIONS,
) -> DataFrame:
    """Closed-form chunk assignment over (conv_id, n_sessions)."""
    order = F.col("conv_id").cast("long")
    w_all = Window.orderBy(order)
    w_prev = w_all.rowsBetween(Window.unboundedPreceding, -1)
    return (
        sizes.withColumn("__idx", F.row_number().over(w_all) - 1)
        .withColumn(
            "__cum_prev", F.coalesce(F.sum("n_sessions").over(w_prev), F.lit(0))
        )
        .select(
            "conv_id",
            "n_sessions",
            F.greatest(
                F.expr(f"__idx div {max_journeys}"),
                F.expr(f"__cum_prev div {max_sessions}"),
            ).alias("chunk_id"),
        )
    )


def pack_groups_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_cumsum(journey_sizes(M.journeys(spark, sf_dir)))


PACK_CUMSUM_SQL = (
    M.ORACLE_PRELUDE.rstrip()
    + ","
    + M.JOURNEYS_CTE.strip()
    + f""",
    jsz AS (SELECT conv_id, COUNT(*) AS n_sessions FROM journeys GROUP BY conv_id),
    ordered AS (
        SELECT conv_id, n_sessions,
               ROW_NUMBER() OVER (ORDER BY CAST(conv_id AS BIGINT)) - 1 AS idx,
               CAST(COALESCE(SUM(n_sessions) OVER (
                   ORDER BY CAST(conv_id AS BIGINT)
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cum_prev
        FROM jsz)
    SELECT conv_id, n_sessions,
           greatest(idx // {MAX_JOURNEYS}, cum_prev // {MAX_SESSIONS}) AS chunk_id
    FROM ordered"""
)


def greedy_pack(sizes: list[tuple[str, int]],
                max_journeys: int = MAX_JOURNEYS,
                max_sessions: int = MAX_SESSIONS) -> list[tuple[str, int, int]]:
    """Reference greedy (journey_builder.py:219-232): close the current
    chunk when adding the next journey would exceed either cap."""
    out, chunk, nj, ns = [], 0, 0, 0
    for conv_id, n in sizes:
        if nj > 0 and (nj + 1 > max_journeys or ns + n > max_sessions):
            chunk, nj, ns = chunk + 1, 0, 0
        out.append((conv_id, n, chunk))
        nj, ns = nj + 1, ns + n
    return out


def pack_greedy(
    sizes: DataFrame,
    max_journeys: int = MAX_JOURNEYS,
    max_sessions: int = MAX_SESSIONS,
) -> DataFrame:
    """Exact greedy packing via a single applyInPandas group.

    Sequential by nature (each decision depends on all prior ones), so
    the whole size list flows through one task — acceptable because
    the input is one row per *journey* (already aggregated), orders of
    magnitude smaller than the session data. At 100 TB, pack within
    date partitions by grouping on a partition column instead of the
    constant key.
    """

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__ord").reset_index(drop=True)
        packed = greedy_pack(
            list(zip(pdf["conv_id"], pdf["n_sessions"])), max_journeys, max_sessions
        )
        return pd.DataFrame(packed, columns=["conv_id", "n_sessions", "chunk_id"])

    return (
        sizes.withColumn("__ord", F.col("conv_id").cast("long"))
        .withColumn("__g", F.lit(0))
        .groupBy("__g")
        .applyInPandas(_pack, "conv_id string, n_sessions long, chunk_id long")
    )


def pack_groups_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_greedy(journey_sizes(M.journeys(spark, sf_dir)))
