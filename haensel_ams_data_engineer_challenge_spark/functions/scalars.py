"""Scalar helpers shared by operators (SURVEY.md §2.7).

``dsum`` — order-independent double summation. Plain SUM(double) is
non-associative: a distributed partial-agg can legally return different
low bits than a single-threaded oracle, so correctness-gated aggregates
route the addition through a fixed-scale DECIMAL (exact integer
arithmetic, order-independent) and cast the total back to double. Both
Spark and DuckDB produce the identical decimal, hence the identical
double, regardless of parallelism. Scale-wise this is still a plain
partial+final hash aggregate (map-side combine applies); decimal adds a
few ns/row over double — negligible next to the shuffle it rides on.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: 25 integer digits / 6 fractional: sums of 1e12 rows of 1e7-sized
#: values fit without overflow; 6 decimals round away double noise.
DECIMAL_T = "decimal(25,6)"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent SUM over a double column (see module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DECIMAL_T)).cast("double")
    return out.alias(alias) if alias else out


def dsum_sql(expr: str, alias: str) -> str:
    """DuckDB twin of ``dsum`` for oracle queries."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE) AS {alias}"


def safe_div(num: Column, den: Column) -> Column:
    """C6/C7: division that yields NULL when the divisor is 0 —
    reproduces the reference's inf->NaN->empty-cell pipeline
    (reporting.py:155-161; golden channel_reporting.csv rows 2-4)."""
    return F.when(den != 0, num / den)


def ts_concat(date_col: str, time_col: str) -> Column:
    """C1+C2: rebuild a timestamp from split text columns
    (db_utils.py:173, journey_builder.py:50)."""
    return F.to_timestamp(
        F.concat_ws(" ", F.col(date_col), F.col(time_col)), "yyyy-MM-dd HH:mm:ss"
    )
