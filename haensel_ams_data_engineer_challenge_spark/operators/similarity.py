"""Similarity search over embedding columns (array<float>).

Float-parity design: the cosine is built as an EXPLICIT left-associated
sum of 64 per-dimension products over double-cast arrays, generated
once in Python and rendered both as a Spark Column tree and as DuckDB
SQL — the identical IEEE operation order makes scores bit-equal across
engines (library dot-products like DuckDB's list_dot_product accumulate
in a different order and are NOT portable).

Scale design (100 TB):
- brute force is two-stage: per-partition local top-k (the window key
  includes spark_partition_id so no single reducer sees all candidates)
  then a final top-k over <= k * n_partitions survivors — the classic
  distributed TopK, no skewed single-key shuffle.
- the LSH variant buckets vectors by the sign pattern of dot products
  with deterministic pseudo-random hyperplanes (constants derived from
  md5 in plain Python, inlined into both engines), so candidate sets
  shrink by ~2^planes and only same-bucket pairs are scored.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..checkpoint import materialize
from ..functions.scalars import dsum

EMBEDDING_DIM = 64
LSH_PLANES = 6


def _d(col: str) -> Column:
    return F.col(col).cast("array<double>")


def dot_expr(col_a: str, col_b: str, dim: int = EMBEDDING_DIM) -> Column:
    """Left-assoc dot product as an array fold.

    ``aggregate(zip_with(a, b, *), 0.0, +)`` adds terms in index order
    starting from +0.0 — bit-identical to the oracle's explicit
    ``t1 + t2 + ...`` chain because ``0.0 + x == x`` in IEEE for every
    x (only -0.0 maps to +0.0, which cannot change a later sum). The
    fold form keeps whole-stage codegen small (a loop, not dim
    unrolled expression nodes — the unrolled form spent seconds in
    Janino at dim=64).
    """
    return F.aggregate(
        F.zip_with(_d(col_a), _d(col_b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_sql(col_a: str, col_b: str, dim: int = EMBEDDING_DIM) -> str:
    """DuckDB twin of ``dot_expr`` — same association order."""
    terms = [f"CAST({col_a}[{i}] AS DOUBLE) * CAST({col_b}[{i}] AS DOUBLE)"
             for i in range(1, dim + 1)]
    return "(" + " + ".join(terms) + ")"


def norm_expr(col: str, dim: int = EMBEDDING_DIM) -> Column:
    return F.sqrt(dot_expr(col, col, dim))


def norm_sql(col: str, dim: int = EMBEDDING_DIM) -> str:
    terms = [f"CAST({col}[{i}] AS DOUBLE) * CAST({col}[{i}] AS DOUBLE)"
             for i in range(1, dim + 1)]
    return "sqrt(" + " + ".join(terms) + ")"


def cosine_expr(col_a: str, col_b: str, dim: int = EMBEDDING_DIM) -> Column:
    return dot_expr(col_a, col_b, dim) / (norm_expr(col_a, dim) * norm_expr(col_b, dim))


def cosine_sql(col_a: str, col_b: str, dim: int = EMBEDDING_DIM) -> str:
    return f"{dot_sql(col_a, col_b, dim)} / ({norm_sql(col_a, dim)} * {norm_sql(col_b, dim)})"


def hyperplanes(planes: int = LSH_PLANES, dim: int = EMBEDDING_DIM) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1]^dim.

    Component (p, i) comes from the first 6 hex digits of
    md5(f"{p}|{i}") — reproducible in any engine/language, no RNG
    state to ship.
    """
    out = []
    for p in range(planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"{p}|{i}".encode()).hexdigest()[:6]
            row.append(round(int(h, 16) / 0xFFFFFF * 2.0 - 1.0, 6))
        out.append(row)
    return out


def bucket_expr(col: str, planes: list[list[float]]) -> Column:
    """LSH bucket id: bit p set iff dot(vec, plane_p) > 0."""
    total = None
    for p, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(_d(col), F.lit(plane), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        term = F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long")
        total = term if total is None else (total + term)
    return total


def bucket_sql(col: str, planes: list[list[float]]) -> str:
    parts = []
    for p, plane in enumerate(planes):
        terms = " + ".join(
            f"CAST({col}[{i + 1}] AS DOUBLE) * CAST({w!r} AS DOUBLE)"
            for i, w in enumerate(plane)
        )
        parts.append(
            f"CASE WHEN ({terms}) > CAST(0.0 AS DOUBLE) THEN {1 << p} ELSE 0 END"
        )
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"


def ann_topk_brute(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query, two-stage distributed.

    ``queries`` (small) is broadcast against every candidate; stage 1
    keeps k survivors per (query, input partition), stage 2 ranks the
    survivors. Output: (query_id, neighbor_id, cosine).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_expr("__qvec", "__cvec"))
        .withColumn("__pid", F.spark_partition_id())
    )
    local = Window.partitionBy("query_id", "__pid").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    survivors = (
        scored.withColumn("__lrn", F.row_number().over(local))
        .filter(F.col("__lrn") <= k)
    )
    final = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        survivors.withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ann_topk_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = LSH_PLANES,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket. Output: (query_id, neighbor_id, cosine, rank)."""
    hp = hyperplanes(planes)
    with_bucket = vectors.withColumn("__bucket", bucket_expr(vec_col, hp))
    q = with_bucket.join(
        queries.select(id_col), id_col, "left_semi"
    ).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        F.col("__bucket"),
    )
    c = with_bucket.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        F.col("__bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "__bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_expr("__qvec", "__cvec"))
    )
    final = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_centroids(
    vectors: DataFrame,
    cell_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cell centroids: (cell, cvec array<double>).

    Per-dimension mean via posexplode + decimal-routed sum/count —
    order-independent, so the centroid is bit-identical to the oracle's
    regardless of partitioning (the parity requirement extends to the
    trained structure, not just the query results).
    """
    per_dim = (
        vectors.select(
            F.col(cell_col).alias("cell"),
            F.posexplode(_d(vec_col)).alias("pos", "v"),
        )
        .groupBy("cell", "pos")
        .agg((dsum("v") / F.count(F.lit(1))).alias("c"))
    )
    return per_dim.groupBy("cell").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "c"))), lambda x: x["c"]
        ).alias("cvec")
    )


def ann_topk_ivf(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """IVF-style ANN: assign each query to its nearest cell centroid,
    then search only that cell's inverted list.

    The testdata's ``label`` column provides the cell assignment a
    k-means training job would produce; centroids are computed (not
    assumed), so the operator is the full IVF query path: train-side
    statistics -> coarse quantizer -> in-cell exact scoring. Output:
    (query_id, cell, neighbor_id, cosine, rank).
    """
    cents = ivf_centroids(vectors, cell_col, vec_col)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec"))
    # coarse quantizer: nearest centroid by cosine (ties -> min cell)
    qc = (
        q.crossJoin(F.broadcast(cents))
        .withColumn(
            "__cos_c",
            F.aggregate(
                F.zip_with(_d("__qvec"), F.col("cvec"), lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / (norm_expr("__qvec") * F.sqrt(
                F.aggregate(
                    F.zip_with(F.col("cvec"), F.col("cvec"), lambda x, y: x * y),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            )),
        )
    )
    w_assign = Window.partitionBy("query_id").orderBy(
        F.col("__cos_c").desc(), F.col("cell").asc()
    )
    assigned = (
        qc.withColumn("__rn", F.row_number().over(w_assign))
        .filter(F.col("__rn") == 1)
        .select("query_id", "__qvec", "cell")
    )
    inverted = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec2"),
        F.col(cell_col).alias("cell"),
    )
    scored = (
        inverted.join(F.broadcast(assigned), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_expr("__qvec", "__cvec2"))
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select("query_id", "cell", "neighbor_id", "cosine", "rank")
    )


LSH_DUP_BANDS = 8
LSH_DUP_BAND_PLANES = 3


def banded_buckets_expr(
    vec_col: str,
    bands: int = LSH_DUP_BANDS,
    planes_per_band: int = LSH_DUP_BAND_PLANES,
) -> Column:
    """Array of (band, bucket) structs: band b's bucket is the sign
    pattern of ``planes_per_band`` dedicated hyperplanes (plane rows
    b*r .. (b+1)*r-1 of the shared deterministic family)."""
    hp = hyperplanes(bands * planes_per_band)
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                bucket_expr(
                    vec_col, hp[b * planes_per_band : (b + 1) * planes_per_band]
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )


def embedding_dup_pairs_lsh(
    vectors: DataFrame,
    threshold: float,
    bands: int = LSH_DUP_BANDS,
    planes_per_band: int = LSH_DUP_BAND_PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Banded-LSH near-duplicate pairs: candidates share a sign-pattern
    bucket in ANY band; every candidate is then scored with the exact
    cosine and kept if >= threshold (so false positives are impossible
    — only recall is approximate).

    This is the 100 TB shape: the only wide shuffle carries
    (band, bucket, id); candidate pairs are a tiny fraction of n^2 and
    fetch their vectors by id. Recall per pair at cosine c is
    1 - (1 - p^r)^B with p = 1 - arccos(c)/pi — for true near-dups
    (c >= 0.9, the regime dedup targets) B=8, r=3 gives ~0.996, and
    tests/test_extensions.py (test_embedding_dup_lsh_full_recall_on_
    planted_near_dups) verifies recall 1.0 on planted
    near-identical vectors. At moderate similarity (c ~ 0.45-0.6, the
    only pairs that exist in the synthetic testdata, where max cosine
    is 0.6) the theoretical recall floor is ~0.92; the registered
    oracle mirrors the banded semantics exactly, so parity is
    bit-exact regardless.
    """
    wb = vectors.select(
        F.col(id_col),
        F.explode(banded_buckets_expr(vec_col, bands, planes_per_band)).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    # the bucket stream feeds both sides of the self-join and exchange
    # reuse does not fire across the branches (same finding as
    # dedup.minhash_bands) — without materialization every row's
    # bands x planes_per_band hyperplane dot products compute twice.
    # The stream is (id, band, bucket): far smaller than the vectors.
    wb = materialize(wb)
    a, b = wb.alias("a"), wb.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    va = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    vb = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", cosine_expr("__va", "__vb"))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def banded_buckets_sql(
    col: str,
    bands: int = LSH_DUP_BANDS,
    planes_per_band: int = LSH_DUP_BAND_PLANES,
) -> str:
    """DuckDB twin of ``banded_buckets_expr`` as a UNION ALL over
    bands: (vec_id, band, bucket) rows from the embeddings table."""
    hp = hyperplanes(bands * planes_per_band)
    selects = [
        f"SELECT vec_id, {b} AS band, "
        + bucket_sql(col, hp[b * planes_per_band : (b + 1) * planes_per_band])
        + " AS bucket FROM embeddings"
        for b in range(bands)
    ]
    return "\n    UNION ALL ".join(selects)


def embedding_dup_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold (id_a < id_b).

    Brute all-pairs — correct at any SF but quadratic; the 100 TB path
    first buckets by ``bucket_expr`` and only scores same-bucket pairs
    (same trade as dedup_minhash_lsh)."""
    a = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_expr("__va", "__vb"))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
