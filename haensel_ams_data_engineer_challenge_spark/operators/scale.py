"""Scale utilities: bucketing and skew salting (SURVEY.md §7 M6).

These do not change results — they change SHUFFLES, which is what
matters at 100 TB:

- ``write_bucketed`` / co-located join: both join sides pre-hashed
  into the same bucket layout on disk -> the join needs NO exchange at
  read time. This is how the J4 session/conversion tables would be
  laid out in production (bucket by user_id), and how the attribution
  sink joins back to sessions (bucket by session_id).
- ``salted_sum``: a hot grouping key floods one reducer; salting
  splits each key into ``n_salts`` sub-keys for the heavy partial
  aggregate, then a second (tiny) aggregate merges the partials. AQE
  skew-join handles skewed JOINS automatically; skewed AGGREGATES
  still need salting when map-side combine can't compress (e.g.
  distinct-style or collect-style aggregates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (optionally sorted) table in the session
    catalog. Joins between tables bucketed the same way on the join
    key run exchange-free."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed catalog tables (no shuffle when both are
    bucketed on ``on`` with equal bucket counts)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def salted_sum(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n_salts: int = 32,
    salt_source: str | None = None,
) -> DataFrame:
    """SUM(value) GROUP BY key, skew-resistant via two-phase salting.

    The salt must be deterministic for reproducibility: derived from
    ``salt_source`` (any high-cardinality column) when given, else
    from the value column's bits. Output equals the plain groupBy sum
    exactly — the partial sums are decimal-routed (order-independent,
    functions/scalars.dsum) so the two-phase regrouping cannot change
    low bits.
    """
    from ..functions.scalars import DECIMAL_T

    src = F.col(salt_source) if salt_source else F.col(value_col)
    salt = F.pmod(F.hash(src), F.lit(n_salts))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(key_col, "__salt")
        .agg(F.sum(F.col(value_col).cast(DECIMAL_T)).alias("__partial"))
    )
    return (
        partial.groupBy(key_col)
        .agg(F.sum("__partial").cast("double").alias(f"sum_{value_col}"))
    )
