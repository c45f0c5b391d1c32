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

NULL ordering contract (round-6 advice #4): ranks here order ASC
NULLS FIRST — stated EXPLICITLY below so the contract is pinned, not
Spark's incidental default — and every DuckDB twin of a rank-based
entry must spell ``NULLS FIRST`` on its value column (DuckDB defaults
to NULLS LAST).  Callers whose order columns can be NULL should also
note the statistic itself diverges from NULL-ignoring aggregates
(``percentile``/``quantile_cont`` skip NULL rows; a rank counts
them) — filter NULLs out first when mirroring such an aggregate.

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


def grouped_row_number(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    out_col: str = "global_rn",
    total_col: str | None = None,
) -> DataFrame:
    """Per-group total-order rank — ``ROW_NUMBER() OVER (PARTITION BY
    group ORDER BY ...)`` — as the stratified prefix count: a dominant
    group never becomes one sort task (the sampling.token_budget_cap
    machinery with weight 1).

    ``total_col`` (round 16, guide §2.4/§5): when set, the output also
    carries the exact per-group row count under that name, computed as
    one more window over the SAME <= n_partitions-row ``totals`` table
    the offsets come from and delivered through the SAME broadcast
    join — so consumers that need (rank, n) pairs (NTILE, exact
    percentiles) skip re-scanning the ranked relation just to count
    it.  Identical integers: sum of per-partition counts == count of
    rows.
    """
    # explicit ASC NULLS FIRST (module docstring: the pinned contract,
    # matching repartitionByRange's null placement; twins say NULLS
    # FIRST because DuckDB defaults to NULLS LAST)
    order = [F.col(c).asc_nulls_first() for c in order_cols]
    ranged = df.repartitionByRange(*group_cols, *order_cols)
    # pin partition ids: __pid feeds two plan branches (local ranks +
    # per-partition totals) which must agree
    ranged = materialize(ranged.withColumn("__pid", F.spark_partition_id()))
    w_local = Window.partitionBy(*group_cols, "__pid").orderBy(*order)
    local = ranged.withColumn("__lrn", F.row_number().over(w_local))
    totals = ranged.groupBy(*group_cols, "__pid").agg(
        F.count(F.lit(1)).alias("__t")
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__t").over(w_off), F.lit(0))
    )
    carry = ["__off"]
    if total_col is not None:
        # same window shape as the offsets (ordered by __pid over the
        # <= n_partitions-row totals), full frame: the per-group total
        w_tot = (
            Window.partitionBy(*group_cols)
            .orderBy("__pid")
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        offsets = offsets.withColumn(
            total_col, F.sum("__t").over(w_tot).cast("long")
        )
        carry.append(total_col)
    offsets = offsets.select(*group_cols, "__pid", *carry)
    return (
        local.join(F.broadcast(offsets), [*group_cols, "__pid"])
        .withColumn(out_col, (F.col("__off") + F.col("__lrn")).cast("long"))
        .drop("__pid", "__lrn", "__off")
    )


def grouped_exact_percentiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    key_col: str,
    ps: dict[str, float],
) -> DataFrame:
    """Exact interpolated percentiles per group WITHOUT buffering any
    group in a single task.

    Spark's `percentile` aggregate materializes each group's values in
    one aggregation buffer — exact, but memory-bound by the largest
    group.  This form gets the same linear-interpolation statistic
    (continuous quantile at position p*(n-1), 0-based) from the
    distributed per-group rank: filter the two ranks framing each
    target position and combine ``(1-g)*lo + g*hi`` — so a 100 TB
    group costs a range shuffle, never one task's memory.

    ``ps``: output column name -> fraction.  Also emits min/max (the
    values at ranks 1 and n) for free.  Output: group_cols + ps keys +
    min_value + max_value.
    """
    # per-group n rides the rank's broadcast offsets (total_col) — the
    # old separate count aggregate re-shuffled and re-joined the whole
    # ranked relation just for the group sizes (round 16)
    j = grouped_row_number(
        df.select(*group_cols, value_col, key_col),
        group_cols,
        [value_col, key_col],
        out_col="__rn",
        total_col="__n",
    )
    v, rn, n = F.col(value_col), F.col("__rn"), F.col("__n")
    aggs = []
    for name, p in ps.items():
        pos = F.lit(p) * (n - F.lit(1)).cast("double")  # 0-based position
        lo = F.floor(pos).cast("long") + F.lit(1)       # 1-based rank below
        hi = F.least(lo + F.lit(1), n)                  # rank above, clamped
        g = pos - F.floor(pos)
        v_lo = F.min(F.when(rn == lo, v))
        v_hi = F.min(F.when(rn == hi, v))
        aggs.append(
            ((F.lit(1.0) - F.min(F.when(rn == lo, g))) * v_lo
             + F.min(F.when(rn == lo, g)) * v_hi).alias(name)
        )
    aggs.append(F.min(F.when(rn == 1, v)).alias("min_value"))
    aggs.append(F.min(F.when(rn == n, v)).alias("max_value"))
    return j.groupBy(*group_cols).agg(*aggs)


def global_prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    weight_col: str,
    out_col: str = "prefix_sum",
) -> DataFrame:
    """Append ``out_col`` = EXCLUSIVE running total of ``weight_col``
    under ORDER BY order_cols — ``SUM(w) OVER (ORDER BY ... ROWS
    BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)`` — as the same
    distributed prefix shape (module docstring): range partition,
    bounded local cumsum, n_partitions-row offset window, broadcast
    back.  Never a single-task global sort.

    ``order_cols`` must be a total order; the first row gets 0.  The
    weighted sibling of :func:`global_row_number` (weight 1 there) and
    the stratum-less sibling of ``sampling.token_budget_cap`` — the
    consumer here is cross-document sequence packing
    (``operators/pack.pack_sequences``), which needs each document's
    global token offset.
    """
    ranged = df.repartitionByRange(*order_cols)
    ranged = materialize(ranged.withColumn("__pid", F.spark_partition_id()))
    order = [F.col(c).asc_nulls_first() for c in order_cols]
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn(
        "__lc", F.coalesce(F.sum(weight_col).over(w_local), F.lit(0))
    )
    totals = ranged.groupBy("__pid").agg(F.sum(weight_col).alias("__t"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__t").over(w_off), F.lit(0))
    ).select("__pid", "__off")
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__off") + F.col("__lc")).cast("long"))
        .drop("__pid", "__lc", "__off")
    )


def global_row_number(
    df: DataFrame, order_cols: list[str], out_col: str = "global_rn"
) -> DataFrame:
    """Append ``out_col`` = 1-based rank under ORDER BY order_cols.

    Identical to ``ROW_NUMBER() OVER (ORDER BY ...)`` provided
    ``order_cols`` is a total order; executed as a distributed prefix
    count (module docstring), never a single-task sort.  The
    group-less instance of :func:`grouped_row_number` — the offset
    window is global but runs over <= n_partitions rows.
    """
    return grouped_row_number(df, [], order_cols, out_col=out_col)


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
    # n rides the rank's own broadcast offsets (total_col) — the old
    # separate count-over-ranked aggregate plus crossJoin re-scanned
    # the whole ranked relation just for one integer (round 16: one
    # fewer query-stage job + one fewer broadcast per call)
    ranked = grouped_row_number(
        df, [], order_cols, out_col="__grn", total_col="__n"
    )
    rank, n = F.col("__grn"), F.col("__n")
    s = F.floor(n / q)          # small-bucket size
    r = n % q                   # number of big (s+1) buckets
    cut = r * (s + F.lit(1))    # ranks 1..cut live in the big buckets
    bucket = F.when(
        rank <= cut, F.floor((rank + s) / (s + F.lit(1)))
    ).otherwise(r + F.floor((rank - cut + s - F.lit(1)) / s))
    return (
        ranked
        .withColumn(out_col, bucket.cast("long"))
        .drop("__grn", "__n")
    )
