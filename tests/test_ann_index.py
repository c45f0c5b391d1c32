"""Persistent ANN index artifacts (round-6 verdict task 5): a fresh
session loading the saved parquet index must return bit-identical
top-k to the training session; mismatched hyperparameters must refuse
loudly; a torn write (no params commit marker) must retrain."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

import haensel_ams_data_engineer_challenge_spark.operators.similarity as S
from haensel_ams_data_engineer_challenge_spark.sources import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_ivf_persistent_index_bit_identical_across_sessions(
    spark, sf_dir, tmp_path
):
    vecs = load_table(spark, sf_dir, "embeddings")
    q = vecs.filter(F.col("vec_id") < 5)
    path = str(tmp_path / "ivf_idx")

    fresh = _rows(S.ann_topk_ivf(vecs, q))                  # full retrain
    trained = _rows(S.ann_topk_ivf(vecs, q, index_path=path))  # train + save
    assert trained == fresh

    # a FRESH session (no shared in-session cache, no lineage) loading
    # the artifact returns bit-identical top-k
    s2 = spark.newSession()
    vecs2 = load_table(s2, sf_dir, "embeddings")
    q2 = vecs2.filter(F.col("vec_id") < 5)
    loaded = _rows(S.ann_topk_ivf(vecs2, q2, index_path=path))
    assert loaded == fresh

    # the load path must come from DISK, not retraining: handing the
    # builder a corpus that would train a DIFFERENT index (5 vectors)
    # still returns the saved assignments/centroids verbatim
    a1, c1 = S.ivf_index_persistent(vecs, path)
    a2, c2 = S.ivf_index_persistent(vecs.limit(5), path)
    assert _rows(a2) == _rows(a1)
    assert _rows(c2) == _rows(c1)


def test_lsh_persistent_index_bit_identical_across_sessions(
    spark, sf_dir, tmp_path
):
    vecs = load_table(spark, sf_dir, "embeddings")
    q = vecs.filter(F.col("vec_id") < 5)
    path = str(tmp_path / "lsh_idx")

    fresh = _rows(S.ann_topk_lsh(vecs, q))
    saved = _rows(S.ann_topk_lsh(vecs, q, index_path=path))
    assert saved == fresh

    s2 = spark.newSession()
    vecs2 = load_table(s2, sf_dir, "embeddings")
    q2 = vecs2.filter(F.col("vec_id") < 5)
    loaded = _rows(S.ann_topk_lsh(vecs2, q2, index_path=path))
    assert loaded == fresh

    # disk-backed, not rebuilt: a 5-vector corpus can't reproduce the
    # full bucket stream, so equality proves the artifact was served
    b1 = _rows(S.lsh_index_persistent(vecs, path))
    b2 = _rows(S.lsh_index_persistent(vecs.limit(5), path))
    assert b2 == b1


def test_persistent_index_param_mismatch_refuses(spark, sf_dir, tmp_path):
    vecs = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf_idx")
    S.ivf_index_persistent(vecs, path, k=5)
    with pytest.raises(ValueError, match="built with"):
        S.ivf_index_persistent(vecs, path, k=10)
    lpath = str(tmp_path / "lsh_idx")
    S.lsh_index_persistent(vecs, lpath, tables=4)
    with pytest.raises(ValueError, match="built with"):
        S.lsh_index_persistent(vecs, lpath, tables=8)


def test_persistent_index_torn_write_retrains(spark, sf_dir, tmp_path):
    """The params table is the commit marker, written last: an
    artifact without it (job killed mid-save) must retrain and
    overwrite instead of serving torn data."""
    vecs = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf_idx")
    a1, c1 = S.ivf_index_persistent(vecs, path, k=5)
    want_a, want_c = _rows(a1), _rows(c1)
    shutil.rmtree(f"{path}/params")  # simulate the torn write
    a2, c2 = S.ivf_index_persistent(vecs, path, k=5)
    assert _rows(a2) == want_a and _rows(c2) == want_c


# ---------------------------------------------------------------------------
# round 9 (r8 verdict task 7): incremental append without retrain
# ---------------------------------------------------------------------------

def _params_version(spark, path):
    return {
        r["key"]: r["value"]
        for r in spark.read.parquet(f"{path}/params").collect()
    }.get("version")


def test_lsh_append_equals_rebuild_bit_exact(spark, sf_dir, tmp_path):
    """LSH buckets are a pure function of the vector: build(old) +
    append(new) == build(old + new), bit for bit — and the version is
    bumped."""
    vecs = load_table(spark, sf_dir, "embeddings")
    old = vecs.filter("vec_id % 5 != 0")
    new = vecs.filter("vec_id % 5 = 0")

    grown_path = str(tmp_path / "lsh_grown")
    S.lsh_index_persistent(old, grown_path, tables=8)
    assert _params_version(spark, grown_path) == "1"
    S.lsh_index_append(new, grown_path, tables=8)
    assert _params_version(spark, grown_path) == "2"

    scratch_path = str(tmp_path / "lsh_scratch")
    S.lsh_index_persistent(vecs, scratch_path, tables=8)
    assert _rows(spark.read.parquet(f"{grown_path}/buckets")) == _rows(
        spark.read.parquet(f"{scratch_path}/buckets")
    )

    # append + query == rebuild-from-scratch top-k on the grown corpus
    q = vecs.filter(F.col("vec_id") < 5)
    grown = _rows(S.ann_topk_lsh(vecs, q, tables=8, index_path=grown_path))
    rebuilt = _rows(S.ann_topk_lsh(vecs, q, tables=8, index_path=scratch_path))
    assert grown == rebuilt

    # replay: a second append of the same batch is a no-op
    before = _rows(spark.read.parquet(f"{grown_path}/buckets"))
    S.lsh_index_append(new, grown_path, tables=8)
    assert _rows(spark.read.parquet(f"{grown_path}/buckets")) == before


def test_ivf_append_assigns_to_frozen_centroids(spark, sf_dir, tmp_path):
    """IVF append: centroids frozen, new vectors land in their nearest
    existing cell (exactly _assign_cells of the new batch), coverage is
    the full grown corpus with no duplicates, and querying the grown
    index finds appended vectors."""
    vecs = load_table(spark, sf_dir, "embeddings")
    old = vecs.filter("vec_id % 5 != 0")
    new = vecs.filter("vec_id % 5 = 0")
    path = str(tmp_path / "ivf_grow")

    a0, c0 = S.ivf_index_persistent(old, path, k=5)
    cents_before = _rows(c0)
    S.ivf_index_append(new, path, k=5)
    assert _params_version(spark, path) == "2"

    # centroids untouched
    assert _rows(spark.read.parquet(f"{path}/centroids")) == cents_before
    # assignments = old build + nearest-frozen-centroid of new batch
    want_new = _rows(S._assign_cells(new, c0, "vec_id", "embedding"))
    got = _rows(spark.read.parquet(f"{path}/assignments"))
    assert got == sorted(_rows(a0) + want_new)

    # the grown index serves queries over the full corpus: every exact
    # top-1 neighbor that shares the query's probed cells is found; at
    # minimum the appended vectors are now candidates — recall floor
    # vs brute force holds on the grown corpus
    q = vecs.filter(F.col("vec_id") < 5)
    approx = S.ann_topk_ivf(vecs, q, k=3, cells=5, index_path=path)
    brute = S.ann_topk_brute(vecs, q, k=3)
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    b = {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}
    assert len(a & b) / len(b) >= 0.6

    # replay is a no-op
    before = _rows(spark.read.parquet(f"{path}/assignments"))
    S.ivf_index_append(new, path, k=5)
    assert _rows(spark.read.parquet(f"{path}/assignments")) == before


def test_append_requires_committed_matching_index(spark, sf_dir, tmp_path):
    vecs = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="no committed"):
        S.ivf_index_append(vecs, str(tmp_path / "nope"))
    with pytest.raises(ValueError, match="no committed"):
        S.lsh_index_append(vecs, str(tmp_path / "nope2"))
    path = str(tmp_path / "ivf")
    S.ivf_index_persistent(vecs, path, k=5)
    with pytest.raises(ValueError, match="built with"):
        S.ivf_index_append(vecs, path, k=10)
