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
- ``salted_join``: the static skew-join form (replicate-small,
  split-big) for when the skew is KNOWN and the small side is too big
  to broadcast; AQE's runtime skew split only fires after a first
  shuffle has measured the partitions and only inside sort-merge
  joins, so a pipeline that knows its hot keys salts up front.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _clear_orphan_location(spark: SparkSession, table_name: str) -> None:
    """Remove a leftover managed-table directory that has no catalog
    entry. A fresh session starts with an empty in-memory catalog, but
    the warehouse dir persists across processes; ``saveAsTable`` then
    fails with LOCATION_ALREADY_EXISTS even under mode("overwrite")
    (round-7 driver gate hit this). Uses the Hadoop FileSystem API so
    it works for any warehouse scheme (file:, hdfs:, s3a:)."""
    if "." in table_name:
        # qualified names live under <db>.db/ in the warehouse; this
        # helper only knows the default-database layout — let
        # saveAsTable surface any orphan rather than deleting a
        # wrongly-derived path
        return
    if spark.catalog.tableExists(table_name):
        return  # registered: mode("overwrite") handles it atomically
    jvm = spark._jvm  # classic (non-Connect) API; local + cluster JVM path
    wh = spark.conf.get("spark.sql.warehouse.dir")
    path = jvm.org.apache.hadoop.fs.Path(wh, table_name.lower())
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(path):
        fs.delete(path, True)


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
    _clear_orphan_location(df.sparkSession, table_name)
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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_source: str,
    small_on: str | None = None,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join via salt replication.

    A hot join key floods one reducer in a shuffle join.  The big
    side gets a deterministic ``__salt`` in [0, n_salts) hashed from
    ``salt_source`` (any high-cardinality column — NOT the join key,
    whose hot value would land every row in one salt; deterministic so
    task retries and re-runs reproduce), the small side is replicated
    ``n_salts``× via explode, and the join runs on (key, __salt) — the
    hot key's rows spread over ``n_salts`` reducers instead of one.

    Row multiset equals the plain join exactly: each big row carries
    exactly one salt and meets exactly one replica of every matching
    small row.  ``how`` may be 'inner' or 'left' (for 'left',
    unmatched big rows survive null-extended as usual; 'right'/'outer'
    would see the small side's replicas as distinct unmatched rows, so
    they are refused).

    Cost/when: the small side shuffles ``n_salts``× its size — use for
    mid-size dims too big to broadcast.  broadcast() is strictly
    better when the dim fits; AQE's skew join handles the residual
    cases where the skew is only discovered at runtime.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports 'inner'/'left', got {how!r}")
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    right_key = small_on or on
    if salt_source == on:
        raise ValueError(
            "salt_source must be a high-cardinality non-key column: "
            "hashing the join key itself maps each hot key to ONE salt"
        )
    salted_big = big.withColumn(
        "__salt", F.pmod(F.hash(F.col(salt_source)), F.lit(n_salts))
    )
    replicated = (
        small.withColumnRenamed(right_key, on)
        if right_key != on
        else small
    ).withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return salted_big.join(replicated, [on, "__salt"], how).drop("__salt")


def kmv_distinct_estimate(
    df: DataFrame, col: str, k: int = 64, salt: str = "kmv"
) -> DataFrame:
    """Approximate COUNT(DISTINCT col) as one row ``approx_distinct``
    (double), via the classic k-minimum-values estimator (Bar-Yossef
    et al., RANDOM'02): hash every value to a 32-bit integer, keep the
    k smallest DISTINCT hashes; with h_k the k-th smallest, estimate
    (k-1) * 2^32 / h_k — or the exact count when fewer than k distinct
    hashes exist.

    Unlike HLL sketches (``approx_count_distinct``), whose registers
    differ across engines, every step here is engine-portable integer
    md5 math (operators/sampling._bucket), so the estimate has a
    BIT-EXACT DuckDB twin and can sit in a hash-checked driver row.

    Scale shape: dedup of 32-bit hashes is one map-side-combinable
    shuffle bounded by the value domain; the ascending limit-sort
    compiles to TakeOrderedAndProject — each task keeps at most k
    rows, so no global sort materializes. Estimator error is
    ~1/sqrt(k-2) relative (k=64 -> ~13%).
    """
    from .sampling import _BUCKETS, _bucket

    hashes = df.select(_bucket(col, salt).alias("__h")).distinct()
    topk = hashes.orderBy(F.col("__h").asc()).limit(k)
    return topk.agg(
        F.when(F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double"))
        .otherwise(
            F.lit(float(k - 1)) * F.lit(float(_BUCKETS)) / F.max("__h").cast("double")
        )
        .alias("approx_distinct")
    )


def kmv_distinct_sql(table: str, col: str, k: int = 64, salt: str = "kmv") -> str:
    """DuckDB twin of ``kmv_distinct_estimate`` (a scalar subquery)."""
    from .sampling import _BUCKETS, _bucket_sql

    b = _bucket_sql(col, salt)
    return (
        f"(SELECT CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE) "
        f"ELSE CAST({k - 1} AS DOUBLE) * CAST({_BUCKETS} AS DOUBLE) "
        f"/ CAST(MAX(__h) AS DOUBLE) END "
        f"FROM (SELECT DISTINCT {b} AS __h FROM {table} "
        f"ORDER BY __h LIMIT {k}) __kmv)"
    )
