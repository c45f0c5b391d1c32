"""Deterministic sampling / splitting for training-data pipelines.

Three operations a 100 TB corpus pipeline needs between dedup and
training:

- ``hash_split``      — leak-proof train/val/test assignment: a pure
                        function of the key, so the same document (or
                        the same *user*, if the key is user_id — the
                        entity-coherent split that prevents test-set
                        leakage of grouped data) lands in the same
                        split on every run, at any parallelism, on any
                        cluster.
- ``stratum_cap``     — at most N rows per stratum (e.g. per language
                        x source), chosen deterministically by hash —
                        a reproducible "downsample the over-represented
                        strata" step.
- ``weighted_interleave`` — mix several corpora with per-source
                        acceptance rates (training mixture weights),
                        deterministic per key.

Portability/parity design: the randomness is md5-hex (identical in
Spark, DuckDB, Python — see dedup.py minhash), reduced to a 32-bit
integer bucket; every decision is an *integer* comparison against a
threshold computed in Python and inlined as a literal on both the
Spark and SQL sides.  No floats anywhere near a boundary, so results
are bit-stable across engines and partitionings.

Scale: all three are embarrassingly parallel JVM expressions
(whole-stage codegen, zero shuffles) except ``stratum_cap``, which is
a two-stage distributed top-n: a local rank per (stratum, input
partition) followed by a final rank over at most n x n_partitions
survivors — no task ever sorts a full stratum, so a dominant stratum
(the 100 TB "en" case) cannot become a single-task sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_BUCKETS = 1 << 32


def _bucket(key_col: str, salt: str):
    """32-bit integer bucket: first 8 hex chars of md5(salt|key).

    SQL twin: ``CAST(concat('0x', substr(md5(concat('salt|', key)), 1, 8)) AS BIGINT)``.
    """
    h = F.md5(F.concat(F.lit(salt + "|"), F.col(key_col).cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def _bucket_sql(key_col: str, salt: str) -> str:
    return (
        f"CAST(concat('0x', substr(md5(concat('{salt}|', "
        f"CAST({key_col} AS VARCHAR))), 1, 8)) AS BIGINT)"
    )


def split_thresholds(fractions: dict[str, float]) -> list[tuple[str, int]]:
    """Cumulative integer thresholds over the 2^32 bucket space.

    Fractions must sum to 1 (+-1e-9); the last split absorbs the
    rounding remainder so the thresholds always cover every bucket.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    out, acc = [], 0.0
    names = list(fractions)
    for i, name in enumerate(names):
        acc += fractions[name]
        hi = _BUCKETS if i == len(names) - 1 else int(acc * _BUCKETS)
        out.append((name, hi))
    return out


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float] | None = None,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic split assignment: adds ``out_col`` with the split
    name.  Zero shuffles; a pure row-local expression."""
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    b = _bucket(key_col, salt)
    expr = None
    for name, hi in reversed(split_thresholds(fractions)):
        expr = F.lit(name) if expr is None else F.when(b < hi, F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def hash_split_sql(
    key_col: str,
    fractions: dict[str, float] | None = None,
    salt: str = "split",
    out_col: str = "split",
) -> str:
    """The ``out_col`` expression's SQL twin (DuckDB + ANSI)."""
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    b = _bucket_sql(key_col, salt)
    ts = split_thresholds(fractions)
    cases = " ".join(f"WHEN {b} < {hi} THEN '{name}'" for name, hi in ts[:-1])
    return f"CASE {cases} ELSE '{ts[-1][0]}' END AS {out_col}"


def stratum_cap(
    df: DataFrame,
    stratum_cols: list[str],
    n: int,
    key_col: str,
    salt: str = "cap",
) -> DataFrame:
    """Keep at most ``n`` rows per stratum, deterministically.

    Rank within each stratum by (md5 bucket, key) — a stable
    pseudo-random order — and keep ranks 1..n.

    Two-stage (the distributed-TopK shape similarity.py's brute top-k
    uses): stage 1 ranks within (stratum, *input partition*) and keeps
    at most ``n`` rows per pair, so no task ever sorts a whole
    stratum — at corpus scale the dominant stratum ("en" is most of a
    100 TB corpus) would otherwise be one skewed single-task sort.
    Stage 2 ranks the <= n x n_partitions survivors per stratum.  The
    global top-n by (bucket, key) within a stratum is a subset of the
    per-partition top-n sets, so the result is identical to the
    single-window form — and independent of the input partitioning.
    """
    order = [_bucket(key_col, salt).asc(), F.col(key_col).asc()]
    local = Window.partitionBy(*stratum_cols, "__pid").orderBy(*order)
    pruned = (
        df.withColumn("__pid", F.spark_partition_id())
        .withColumn("__lrk", F.row_number().over(local))
        .filter(F.col("__lrk") <= n)
        .drop("__pid", "__lrk")
    )
    w = Window.partitionBy(*stratum_cols).orderBy(*order)
    return (
        pruned.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .drop("__rk")
    )


def stratum_cap_sql(
    table: str, stratum_cols: list[str], n: int, key_col: str, salt: str = "cap"
) -> str:
    b = _bucket_sql(key_col, salt)
    parts = ", ".join(stratum_cols)
    return (
        f"SELECT * EXCLUDE (__rk) FROM (SELECT *, ROW_NUMBER() OVER "
        f"(PARTITION BY {parts} ORDER BY {b} ASC, {key_col} ASC) AS __rk "
        f"FROM {table}) WHERE __rk <= {n}"
    )


def weighted_mix_filter(
    df: DataFrame,
    source_expr,
    weights: dict[str, float],
    key_col: str,
    salt: str = "mix",
    source_col: str = "source_name",
) -> DataFrame:
    """``weighted_interleave`` for a PRE-UNIONED corpus: rows carry (or
    derive) their source, and each row is kept iff its per-source md5
    bucket clears the source's weight threshold.

    This is the 100 TB shape when the corpus is one table with a
    source column (the usual post-ingestion layout): a row-local
    CASE + integer comparison — zero shuffles, zero broadcasts —
    whereas ``weighted_interleave`` (separate source tables) unions
    per-source scans.  Same thresholds, same salts, so the two forms
    keep bit-identical row sets (tested).

    ``source_expr`` is a Column yielding the source name per row; its
    values must be keys of ``weights`` — a row with an unlisted (or
    NULL) source raises at execution time rather than silently
    disappearing from the mixture.  Weight 1.0 and 0.0 compile to
    constant keep/drop (no per-row hash for the dominant
    keep-everything source).
    """
    for name, weight in weights.items():
        if not 0.0 <= weight <= 1.0:
            raise ValueError(f"{name}: weight must be in [0, 1], got {weight}")
    if not weights:
        raise ValueError("no sources given")
    tagged = df.withColumn(source_col, source_expr)
    keep = None
    for name, weight in weights.items():
        if weight == 1.0:
            cond = F.lit(True)
        elif weight == 0.0:
            cond = F.lit(False)
        else:
            cond = _bucket(key_col, f"{salt}|{name}") < int(weight * _BUCKETS)
        branch = (F.col(source_col) == name, cond)
        keep = F.when(*branch) if keep is None else keep.when(*branch)
    keep = keep.otherwise(
        F.raise_error(
            F.concat(
                F.lit("weighted_mix_filter: source not in weights: "),
                F.coalesce(F.col(source_col).cast("string"), F.lit("NULL")),
            )
        )
    )
    return tagged.filter(keep)


def weighted_interleave(
    sources: dict[str, tuple[DataFrame, float]],
    key_col: str,
    salt: str = "mix",
    source_col: str = "source_name",
) -> DataFrame:
    """Mix corpora with per-source acceptance rates.

    Each source keeps rows whose bucket falls below ``weight * 2^32``
    (weight 1.0 keeps everything, 0.0 nothing); rows are tagged with
    the source name and unioned.  The per-source salt makes
    acceptance independent across sources.  Zero shuffles.
    """
    out = None
    for name, (df, weight) in sources.items():
        if not 0.0 <= weight <= 1.0:
            raise ValueError(f"{name}: weight must be in [0, 1], got {weight}")
        hi = _BUCKETS if weight == 1.0 else int(weight * _BUCKETS)
        part = df.filter(_bucket(key_col, f"{salt}|{name}") < hi).withColumn(
            source_col, F.lit(name)
        )
        out = part if out is None else out.unionByName(part)
    if out is None:
        raise ValueError("no sources given")
    return out


def temperature_weights(
    counts: dict[str, int], alpha: float = 0.5
) -> dict[str, float]:
    """Per-stratum acceptance rates implementing TEMPERATURE sampling
    (the multilingual-pretraining rule: sample stratum s with
    probability ∝ n_s^alpha, alpha in (0, 1] — alpha = 1 is natural
    proportions, smaller alpha flattens toward uniform) by DOWNSAMPLING
    only: keep rate a_s ∝ n_s^(alpha-1), normalized so the smallest
    stratum keeps everything.  Expected kept counts are then
    ∝ n_s^alpha exactly.

    alpha = 0.5 computes via ``sqrt(n_min / n_s)`` — IEEE sqrt is
    correctly rounded in every engine (Python, Spark, DuckDB), so the
    derived integer thresholds are bit-identical across them; generic
    alpha uses ``pow``, which carries no such guarantee (fine for
    training pipelines, not for an exact oracle twin).
    """
    import math

    if not counts:
        raise ValueError("no strata given")
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    n_min = min(counts.values())
    if n_min <= 0:
        raise ValueError("stratum counts must be positive")
    if alpha == 1.0:
        return {s: 1.0 for s in counts}
    if alpha == 0.5:
        return {s: math.sqrt(n_min / n) for s, n in counts.items()}
    return {s: (n_min / n) ** (1.0 - alpha) for s, n in counts.items()}


def temperature_thresholds(
    counts: dict[str, int], alpha: float = 0.5
) -> dict[str, int]:
    """``temperature_weights`` as inlined integer bucket thresholds
    (keep iff md5 bucket < threshold): ``int(a_s * 2^32)``.  With
    alpha = 0.5 the whole derivation — exact-rounded division,
    correctly-rounded sqrt, exact *2^32, truncation — is
    bit-deterministic, so a SQL twin recomputing it from its own
    counts lands on the same integers."""
    return {
        s: _BUCKETS if w == 1.0 else int(w * _BUCKETS)
        for s, w in temperature_weights(counts, alpha).items()
    }


def temperature_mix(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    alpha: float = 0.5,
    salt: str = "tempmix",
) -> DataFrame:
    """Temperature-sample a corpus by stratum (language, source):
    counts per stratum -> ``temperature_weights`` -> the row-local
    ``weighted_mix_filter``.  The per-stratum count aggregate is
    collected driver-side — bounded by the number of strata (a
    broadcast-class set, like the CC edge fast path); the filter
    itself is zero-shuffle row-local integer comparison."""
    counts = {
        r[0]: r[1] for r in df.groupBy(stratum_col).count().collect()
    }
    weights = temperature_weights(counts, alpha)
    return weighted_mix_filter(
        df, F.col(stratum_col), weights, key_col, salt=salt,
        source_col=f"__{stratum_col}_tag",
    ).drop(f"__{stratum_col}_tag")


def token_budget_cap(
    df: DataFrame,
    stratum_cols: list[str],
    budget: int,
    weight_col: str,
    key_col: str,
    salt: str = "tokcap",
) -> DataFrame:
    """Keep rows, in deterministic hash order, until a stratum's
    cumulative ``weight_col`` (token/char count) exceeds ``budget`` —
    the TOKEN-budgeted counterpart of ``stratum_cap`` (training
    mixtures are budgeted in tokens, not document counts).  A row is
    kept iff its running total through itself is <= budget, so the
    kept set is the maximal hash-order prefix within budget.

    Scale shape — a distributed prefix sum, NOT one window per
    stratum (a dominant stratum would make that a single-task sort,
    the DESIGN.md anti-pattern):

    1. range-repartition on (stratum, bucket, key) — the global sort
       order becomes the partition order;
    2. local cumulative sum per (stratum, input partition) — each
       window is bounded by the partition size;
    3. per-(stratum, partition) totals -> per-partition offsets via a
       window over AT MOST n_partitions rows per stratum -> broadcast
       back.  global_cum = offset + local_cum.

    The result depends only on the total order (bucket, key), never on
    where the range boundaries fell, so it is bit-stable across
    partitionings and engines.  SQL twin: a plain
    ``SUM(w) OVER (PARTITION BY stratum ORDER BY bucket, key ROWS
    UNBOUNDED PRECEDING) <= budget`` — the oracle can afford the
    single-window form.
    """
    from ..checkpoint import materialize

    # NOTE: operators/rank.py::global_row_number is the stratum-less,
    # weight=1 instance of this exact machinery (range partition ->
    # pinned __pid -> bounded local window -> n_partitions-row offset
    # window -> broadcast back).  A fix to either loop (NULL ordering,
    # AQE interplay, pid pinning) almost certainly applies to both.
    b = _bucket(key_col, salt)
    ranged = df.withColumn("__b", b).repartitionByRange(
        *stratum_cols, "__b", key_col
    )
    # pin partition ids: __pid feeds two plan branches (local cumsum +
    # totals) and must agree between them
    ranged = materialize(ranged.withColumn("__pid", F.spark_partition_id()))
    order = [F.col("__b").asc(), F.col(key_col).asc()]
    w_local = (
        Window.partitionBy(*stratum_cols, "__pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("__lc", F.sum(weight_col).over(w_local))
    totals = ranged.groupBy(*stratum_cols, "__pid").agg(
        F.sum(weight_col).alias("__t")
    )
    w_off = (
        Window.partitionBy(*stratum_cols)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__t").over(w_off), F.lit(0))
    ).select(*stratum_cols, "__pid", "__off")
    return (
        local.join(F.broadcast(offsets), [*stratum_cols, "__pid"])
        .filter((F.col("__off") + F.col("__lc")) <= budget)
        .drop("__b", "__pid", "__lc", "__off")
    )


def token_budget_cap_sql(
    table: str,
    stratum_cols: list[str],
    budget: int,
    weight_col: str,
    key_col: str,
    salt: str = "tokcap",
) -> str:
    """DuckDB twin of ``token_budget_cap`` (single-window form)."""
    b = _bucket_sql(key_col, salt)
    parts = ", ".join(stratum_cols)
    return (
        f"SELECT * EXCLUDE (__cum) FROM (SELECT *, SUM({weight_col}) OVER "
        f"(PARTITION BY {parts} ORDER BY {b} ASC, {key_col} ASC "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __cum "
        f"FROM {table}) WHERE __cum <= {budget}"
    )


def global_shuffle(
    df: DataFrame,
    n_shards: int,
    seed: str = "",
    id_col: str = "doc_id",
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    ``shard`` in [0, n_shards) and a 1-based ``pos`` within its shard
    — together a total order that is a seeded pseudo-random
    permutation of the corpus (the order a trainer consumes shards
    in).  Reading shard 0 pos 1..k, shard 1 pos 1..k, ... replays the
    SAME permutation on any engine, any partitioning, any rerun —
    reshuffling is just a new ``seed``.

    Two independent md5 streams (the hash_embed pattern): the shard
    assignment keys ``gss|seed|id`` and the within-shard order keys
    ``gso|seed|id``, so shard membership and intra-shard order are
    uncorrelated.  ``pos`` comes from the stratified prefix count
    (``rank.grouped_row_number``) — one range shuffle plus a
    n_partitions-row offset window, NEVER a single-task global sort:
    the 100 TB corpus shuffles in fully parallel stages and each
    shard's order is reproducible independently (a trainer node can
    materialize just its own shard).

    SQL twin shape: ``ROW_NUMBER() OVER (PARTITION BY shard ORDER BY
    md5_key, id)`` over ``md5_bucket % n_shards``.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    from .rank import grouped_row_number

    okey = F.md5(
        F.concat(F.lit(f"gso|{seed}|"), F.col(id_col).cast("string"))
    )
    tagged = df.withColumn("__gso", okey).withColumn(
        shard_col, _bucket(id_col, f"gss|{seed}") % n_shards
    )
    return grouped_row_number(
        tagged, [shard_col], ["__gso", id_col], out_col=pos_col
    ).drop("__gso")


def global_shuffle_sql(
    table: str,
    n_shards: int,
    seed: str = "",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of ``global_shuffle``: emits (id, shard, pos) plus
    the order key as ``okey`` (callers project what they need)."""
    okey = f"md5(concat('gso|{seed}|', CAST({id_col} AS VARCHAR)))"
    shard = f"{_bucket_sql(id_col, f'gss|{seed}')} % {n_shards}"
    return (
        f"SELECT {id_col}, {okey} AS okey, CAST({shard} AS BIGINT) AS shard, "
        f"CAST(ROW_NUMBER() OVER (PARTITION BY {shard} "
        f"ORDER BY {okey} ASC, {id_col} ASC) AS BIGINT) AS pos "
        f"FROM {table}"
    )
