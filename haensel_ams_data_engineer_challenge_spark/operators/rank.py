"""Exact distributed order statistics: global row numbers and NTILE.

`ROW_NUMBER() OVER (ORDER BY ...)` and `NTILE(q) OVER (ORDER BY ...)`
have an empty PARTITION BY — Spark executes them as a SINGLE-TASK
sort of the whole relation, the canonical scale anti-pattern
(DESIGN.md).  This module computes the identical results with the
distributed prefix-sum shape `sampling.token_budget_cap` established:

1. range-repartition on the order columns — the global sort order
   becomes the partition order;
2. per-partition local row_number — every window is bounded by the
   partition size;
3. per-partition row counts -> partition offsets via a window over AT
   MOST n_partitions rows -> broadcast back;
   global_rank = offset + local_rank.

The result depends only on the total order, never on where the range
boundaries fell — bit-stable across partitionings and engines.  The
order columns MUST form a total order (append a unique key column as
the last tie-break); otherwise ties make any rank assignment
engine-dependent.

NTILE needs no second pass: with n rows and q buckets, NTILE assigns
ranks 1..n to buckets of size ceil(n/q) (first n mod q buckets) then
floor(n/q) — a row-local integer expression of (rank, n, q).  The
consumer here is CCNet-style perplexity bucketing (head/middle/tail
thirds of the corpus by LM cross-entropy — Wenzek et al. 2020 §4.3),
but the operator is generic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..checkpoint import materialize


def global_row_number(
    df: DataFrame, order_cols: list[str], out_col: str = "global_rn"
) -> DataFrame:
    """Append ``out_col`` = 1-based rank under ORDER BY order_cols.

    Identical to ``ROW_NUMBER() OVER (ORDER BY ...)`` provided
    ``order_cols`` is a total order; executed as a distributed prefix
    count (module docstring), never a single-task sort.
    """
    order = [F.col(c).asc() for c in order_cols]
    ranged = df.repartitionByRange(*order_cols)
    # pin partition ids: __pid feeds two plan branches (local ranks +
    # per-partition totals) which must agree
    ranged = materialize(ranged.withColumn("__pid", F.spark_partition_id()))
    w_local = Window.partitionBy("__pid").orderBy(*order)
    local = ranged.withColumn("__lrn", F.row_number().over(w_local))
    totals = ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__t"))
    w_off = (
        Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # the offset window is global but runs over <= n_partitions rows
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__t").over(w_off), F.lit(0))
    ).select("__pid", "__off")
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__off") + F.col("__lrn")).cast("long"))
        .drop("__pid", "__lrn", "__off")
    )


def ntile_exact(
    df: DataFrame,
    q: int,
    order_cols: list[str],
    out_col: str = "bucket",
) -> DataFrame:
    """Append ``out_col`` = exact ``NTILE(q) OVER (ORDER BY ...)``.

    Bucket sizes match SQL NTILE: the first ``n mod q`` buckets hold
    ``ceil(n/q)`` rows, the rest ``floor(n/q)`` — derived row-locally
    from the global rank, so the only additions over
    :func:`global_row_number` are one count aggregate and integer
    arithmetic.
    """
    if q < 1:
        raise ValueError(f"q must be >= 1, got {q}")
    ranked = global_row_number(df, order_cols, out_col="__grn")
    # count over RANKED (whose range-partitioned rows are materialized
    # inside global_row_number) — counting `df` would re-execute the
    # caller's full lineage a second time just for n
    n_row = ranked.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    rank, n = F.col("__grn"), F.col("__n")
    s = F.floor(n / q)          # small-bucket size
    r = n % q                   # number of big (s+1) buckets
    cut = r * (s + F.lit(1))    # ranks 1..cut live in the big buckets
    bucket = F.when(
        rank <= cut, F.floor((rank + s) / (s + F.lit(1)))
    ).otherwise(r + F.floor((rank - cut + s - F.lit(1)) / s))
    return (
        ranked.crossJoin(F.broadcast(n_row))
        .withColumn(out_col, bucket.cast("long"))
        .drop("__grn", "__n")
    )
