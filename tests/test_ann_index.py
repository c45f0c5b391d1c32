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


def _tear_manifests(path):
    """Simulate a torn build under the round-12 manifest protocol: a
    job killed before its manifest rename leaves data files but no
    committed manifest — builders must retrain, readers see nothing."""
    import glob
    import os

    for f in glob.glob(f"{path}/_manifest_v*.json"):
        os.remove(f)


def test_persistent_index_torn_write_retrains(spark, sf_dir, tmp_path):
    """The manifest is the commit: an artifact without one (job killed
    mid-save) must retrain and overwrite instead of serving torn
    data."""
    vecs = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf_idx")
    a1, c1 = S.ivf_index_persistent(vecs, path, k=5)
    want_a, want_c = _rows(a1), _rows(c1)
    _tear_manifests(path)  # simulate the torn write
    a2, c2 = S.ivf_index_persistent(vecs, path, k=5)
    assert _rows(a2) == want_a and _rows(c2) == want_c


# ---------------------------------------------------------------------------
# round 9 (r8 verdict task 7): incremental append without retrain
# ---------------------------------------------------------------------------

def _params_version(spark, path):
    return S._read_index_params(spark, path).get("version")


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


# ---------------------------------------------------------------------------
# round 11: int8-quantized storage INSIDE the persistent artifacts
# (r10 verdict task 2) — tinyint components + per-vector scale, the 8x
# vector-memory lever, marker-pinned against float readers.
# ---------------------------------------------------------------------------


def test_quantized_ivf_recall_floor_and_size(spark, sf_dir, tmp_path):
    """The quantized index must (a) rank from the STORED int8 vectors,
    (b) keep recall within a whisker of the float index, (c) actually
    be small: the vectors table beats the float corpus parquet by >=4x
    on disk (the arrays themselves are 8x — 1 byte vs 8 per component;
    parquet headers + id/scale columns dilute the file-level ratio)."""
    import os

    # one output file for the size comparison: at the 500-row fixture
    # scale, per-file parquet headers would otherwise dominate the
    # vectors-table size (training math is partitioning-independent)
    vecs = load_table(spark, sf_dir, "embeddings").repartition(1)
    q = vecs.filter(F.col("vec_id") < 20)
    fpath, qpath = str(tmp_path / "ivf_f"), str(tmp_path / "ivf_q")

    got_f = {
        (r["query_id"], r["neighbor_id"])
        for r in S.ann_topk_ivf(vecs, q, k=5, index_path=fpath).collect()
    }
    got_q = {
        (r["query_id"], r["neighbor_id"])
        for r in S.ann_topk_ivf(
            vecs, q, k=5, index_path=qpath, quantize=True
        ).collect()
    }
    # recall floor vs the float index (sf0.01 measures 247/250
    # identical pairs; the floor leaves slack for grid ties)
    assert len(got_q & got_f) / len(got_f) >= 0.9

    # the stored layout is genuinely tinyint + scale
    stored = spark.read.parquet(f"{qpath}/vectors")
    assert dict(stored.dtypes)["qvec"] == "array<tinyint>"
    assert dict(stored.dtypes)["scale"] == "double"
    assert stored.count() == vecs.count()

    # on-disk size: quantized vectors table vs the float corpus
    def _sz(p):
        if os.path.isfile(p):
            return os.path.getsize(p)
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(p)
            for f in fs
        )

    src = os.path.join(sf_dir, "embeddings.parquet")
    assert _sz(src) / _sz(f"{qpath}/vectors") >= 4.0


def test_quantized_layout_marker_pins_readers(spark, sf_dir, tmp_path):
    """A float reader on a quantized artifact refuses (and vice versa)
    — the two layouts score different spaces and must never be served
    interchangeably.  Legacy artifacts (no 'quantized' key) read as
    float."""
    vecs = load_table(spark, sf_dir, "embeddings")
    qpath = str(tmp_path / "ivf_q")
    S.ivf_index_persistent(vecs, qpath, quantize=True)
    with pytest.raises(ValueError, match="stores int8-quantized"):
        S.ivf_index_persistent(vecs, qpath)  # float reader refuses
    fpath = str(tmp_path / "ivf_f")
    S.ivf_index_persistent(vecs, fpath)
    with pytest.raises(ValueError, match="stores float"):
        S.ivf_index_persistent(vecs, fpath, quantize=True)
    # legacy marker (no 'quantized' key) == float layout
    got = S._read_index_params(spark, fpath)
    got.pop("quantized")
    S._write_index_params(spark, fpath, got)
    S.ivf_index_persistent(vecs, fpath)  # still serves
    # quantize without a persistent path is a contract error
    q = vecs.filter(F.col("vec_id") < 3)
    with pytest.raises(ValueError, match="needs a persistent artifact"):
        S.ann_topk_ivf(vecs, q, quantize=True)


def test_quantized_append_grows_stored_vectors(spark, sf_dir, tmp_path):
    """Appends to a quantized artifact extend BOTH tables (assignments
    + stored int8 vectors), replay-idempotently; the grown index is
    probeable and finds the appended vector."""
    vecs = load_table(spark, sf_dir, "embeddings")
    base = vecs.filter(F.col("vec_id") % 2 == 0)
    extra = vecs.filter(F.col("vec_id") % 2 == 1)
    qpath = str(tmp_path / "ivf_q")
    S.ivf_index_persistent(base, qpath, quantize=True)
    n0 = spark.read.parquet(f"{qpath}/vectors").count()
    S.ivf_index_append(extra, qpath)
    n1 = spark.read.parquet(f"{qpath}/vectors").count()
    assert n1 == vecs.count() and n1 > n0
    # replay is a no-op on both tables
    S.ivf_index_append(extra, qpath)
    assert spark.read.parquet(f"{qpath}/vectors").count() == n1
    assert (
        spark.read.parquet(f"{qpath}/assignments").count() == n1
    )
    # the appended vectors are findable through the quantized probe
    q = extra.limit(3)
    hits = S.ann_topk_ivf(
        vecs, q, k=5, index_path=qpath, quantize=True
    )
    assert hits.count() > 0

    # LSH twin: same grow-both-tables contract
    lpath = str(tmp_path / "lsh_q")
    S.lsh_index_persistent(base, lpath, quantize=True)
    S.lsh_index_append(extra, lpath)
    assert spark.read.parquet(f"{lpath}/vectors").count() == vecs.count()
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in S.ann_topk_lsh(
            vecs, q, k=3, index_path=lpath, quantize=True
        ).collect()
    }
    assert got  # quantized LSH probe scores from the artifact


def test_quantized_append_crash_is_atomic_and_replayable(spark, sf_dir, tmp_path, monkeypatch):
    """Round-12 (manifest protocol): a crash mid-append can no longer
    leave the assignments and vectors tables DIVERGED — both commit in
    one atomic manifest rename.  A crash before the commit leaves the
    artifact exactly at its previous generation; the replay appends
    the full remainder to both tables."""
    vecs = load_table(spark, sf_dir, "embeddings")
    base = vecs.filter(F.col("vec_id") % 2 == 0)
    extra = vecs.filter(F.col("vec_id") % 2 == 1)
    qpath = str(tmp_path / "ivf_q")
    S.ivf_index_persistent(base, qpath, quantize=True)
    n_base = base.count()

    # inject the crash mid-append (before anything can commit)
    real = S.quantize_to_storage

    def boom(*a, **kw):
        raise RuntimeError("injected crash during the append")

    monkeypatch.setattr(S, "quantize_to_storage", boom)
    with pytest.raises(RuntimeError, match="injected"):
        S.ivf_index_append(extra, qpath)
    monkeypatch.setattr(S, "quantize_to_storage", real)

    # ATOMIC: neither table grew — readers stayed on the previous
    # generation through the whole failed append
    n_all = vecs.count()
    assert S._index_table(spark, qpath, "assignments").count() == n_base
    assert S._index_table(spark, qpath, "vectors").count() == n_base

    # replay appends the full remainder to BOTH tables in one commit
    S.ivf_index_append(extra, qpath)
    assert S._index_table(spark, qpath, "vectors").count() == n_all
    assert S._index_table(spark, qpath, "assignments").count() == n_all


def test_lsh_quantize_without_index_path_refuses(spark, sf_dir):
    vecs = load_table(spark, sf_dir, "embeddings")
    q = vecs.filter(F.col("vec_id") < 3)
    with pytest.raises(ValueError, match="needs a persistent artifact"):
        S.ann_topk_lsh(vecs, q, quantize=True)


# ---------------------------------------------------------------------------
# production IVF training (round 12, r11 verdict task 3): sampled
# training, k~sqrt(N) sizing, append-drift accounting
# ---------------------------------------------------------------------------


def _recall_vs_brute(spark, vecs, hits, k=3):
    """Mean fraction of the exact top-k found, over all queries."""
    brute = S.ann_topk_brute(vecs, vecs.limit(25), k=k)
    exact = {}
    for r in brute.collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got = {}
    for r in hits.collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return sum(
        len(got.get(q, set()) & n) / len(n) for q, n in exact.items()
    ) / len(exact)


def test_sampled_training_recall_within_floor_of_full(spark, sf_dir):
    """Lloyd rounds over a deterministic ~50% hash sample (assignment
    still covers every vector) must hold recall@3 within 0.15 of
    full-corpus training on the testdata embeddings — the FAISS
    train-on-sample discipline, pinned."""
    vecs = load_table(spark, sf_dir, "embeddings")
    n = vecs.count()
    queries = vecs.limit(25)
    full = S.ann_topk_ivf(vecs, queries, k=3)
    sampled = S.ann_topk_ivf(
        vecs, queries, k=3, train_sample_cap=n // 2
    )
    r_full = _recall_vs_brute(spark, vecs, full)
    r_sampled = _recall_vs_brute(spark, vecs, sampled)
    assert r_sampled >= r_full - 0.15, (r_full, r_sampled)
    # the sample predicate is a hash, not a prefix: both runs are
    # deterministic, so re-running reproduces identical hits
    again = S.ann_topk_ivf(vecs, queries, k=3, train_sample_cap=n // 2)
    assert _rows(sampled) == _rows(again)


def test_suggest_cells_sqrt_rule():
    assert S.ivf_suggest_cells(100) == 10
    assert S.ivf_suggest_cells(10_000_000_000) == 100_000
    assert S.ivf_suggest_cells(0) == 1


def test_sample_cap_pinned_in_marker(spark, sf_dir, tmp_path):
    """An artifact trained on a sample records the cap; a caller
    asserting a DIFFERENT cap refuses; the cap-less read serves it
    (the cap is a training detail, not a layout)."""
    vecs = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf_sampled")
    S.ivf_index_persistent(vecs, path, train_sample_cap=200)
    params = S._read_index_params(spark, path)
    assert params["train_sample_cap"] == "200"
    assert params["drift_stat"] == "1.0"
    assert params["cell_profile"]
    with pytest.raises(ValueError, match="built with"):
        S.ivf_index_persistent(vecs, path, train_sample_cap=99)
    # cap-less caller: subset match passes, artifact served as-is
    a, _ = S.ivf_index_persistent(vecs, path)
    assert a.count() == vecs.count()


def test_drift_stat_moves_under_skewed_appends(spark, sf_dir, tmp_path):
    """Uniform-ish appends keep drift_stat near 1; appends cloned
    around ONE corpus vector (all landing in one cell) push it up —
    the retrain signal."""
    import json

    vecs = load_table(spark, sf_dir, "embeddings")
    base = vecs.filter(F.col("vec_id") < 400)
    path = str(tmp_path / "ivf_drift")
    S.ivf_index_persistent(base, path)
    p0 = S._read_index_params(spark, path)
    assert float(p0["drift_stat"]) == 1.0

    # skewed batch: many copies (new ids) of one vector — they all
    # assign to that vector's cell
    one = base.orderBy("vec_id").limit(1)
    skew = one.crossJoin(
        spark.range(1000, 1200).select(F.col("id").alias("new_id"))
    ).select(
        (F.col("new_id") + 100000).alias("vec_id"),
        F.col("embedding"),
        *[c for c in base.columns if c not in ("vec_id", "embedding")],
    )
    S.ivf_index_append(skew.select(*base.columns), path)
    p1 = S._read_index_params(spark, path)
    drift = float(p1["drift_stat"])
    assert drift > 1.3, p1["drift_stat"]
    # the training profile itself is FROZEN (baseline, not a ratchet)
    assert p1["cell_profile"] == p0["cell_profile"]
    assert int(p1["version"]) == int(p0["version"]) + 1
    # profile is real occupancy: counts sum to the training corpus
    assert sum(json.loads(p0["cell_profile"]).values()) == base.count()


def test_cli_ann_train_sample_cap_and_index_stats(spark, sf_dir, tmp_path, capsys):
    """CLI wiring (round 12): --train-sample-cap pins the cap in the
    built index's params; --index-stats prints version/drift/profile."""
    from haensel_ams_data_engineer_challenge_spark.__main__ import main

    docs = load_table(spark, sf_dir, "documents")
    src = docs.orderBy("doc_id").limit(1).collect()
    q = spark.createDataFrame(
        [(9001, src[0]["text"])], "query_id long, text string"
    )
    qpath = str(tmp_path / "queries")
    q.write.parquet(qpath)
    work = str(tmp_path / "wd")
    rc = main([
        "search", "--sf-dir", sf_dir, "--work-dir", work,
        "--queries-parquet", qpath, "--k", "3", "--method", "ann",
        "--train-sample-cap", "200", "--index-stats",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "index-stats" in out
    assert "drift_stat=1.0" in out
    assert "train_sample_cap=200" in out
    params = S._read_index_params(spark, f"{work}/ann_index")
    assert params["train_sample_cap"] == "200"
    assert params["cell_profile"]


def test_ivf_index_retrain_resets_drift_and_resizes(spark, sf_dir, tmp_path):
    """Round 12: the HOW of retraining the drift stat asks for — fresh
    Lloyd rounds over the grown corpus, k resized by the sqrt-N rule,
    one atomic manifest swap (no delete-then-rebuild gap), drift back
    to 1.0, version bumped so every cache keyed on it refreshes."""
    import json

    vecs = load_table(spark, sf_dir, "embeddings")
    base = vecs.filter(F.col("vec_id") < 400)
    path = str(tmp_path / "ivf_rt")
    S.ivf_index_persistent(base, path)
    one = base.orderBy("vec_id").limit(1)
    skew = one.crossJoin(
        spark.range(1000, 1200).select(F.col("id").alias("new_id"))
    ).select(
        (F.col("new_id") + 100000).alias("vec_id"),
        F.col("embedding"),
        *[c for c in base.columns if c not in ("vec_id", "embedding")],
    ).select(*base.columns)
    S.ivf_index_append(skew, path)
    p1 = S._read_index_params(spark, path)
    assert float(p1["drift_stat"]) > 1.3

    grown = base.unionByName(skew)
    p2 = S.ivf_index_retrain(grown, path)
    assert float(p2["drift_stat"]) == 1.0
    assert int(p2["version"]) == int(p1["version"]) + 1
    assert int(p2["k"]) == S.ivf_suggest_cells(grown.count())
    assert p2["retrained_from_k"] == p1["k"]
    # the new training profile covers the FULL grown corpus (appended
    # vectors stop being frozen-centroid second-class citizens)
    assert sum(json.loads(p2["cell_profile"]).values()) == grown.count()
    # the retrained artifact serves at its own committed shape; the
    # stale session default refuses (hyperparameter check)
    q = base.filter(F.col("vec_id") < 3)
    hits = S.ann_topk_ivf(
        grown, q, index_path=path,
        cells=int(p2["k"]), iters=int(p2["iters"]),
    )
    # each query gets a full ranked top-k (self excluded by contract);
    # a skew CLONE of the planted vector must be findable at cosine 1
    got = {(r["query_id"], r["rank"]) for r in hits.collect()}
    assert got == {(q, r) for q in (0, 1, 2) for r in (1, 2, 3)}
    planted = base.orderBy("vec_id").limit(1).collect()[0]["vec_id"]
    clone_hits = S.ann_topk_ivf(
        grown, grown.filter(F.col("vec_id") == planted),
        k=1, index_path=path,
        cells=int(p2["k"]), iters=int(p2["iters"]),
    ).collect()
    assert clone_hits[0]["cosine"] > 0.9999  # its clones share the cell
    with pytest.raises(ValueError, match="built with"):
        S.ann_topk_ivf(grown, q, index_path=path)
    # retraining nothing is a caller bug
    with pytest.raises(ValueError, match="no committed IVF index"):
        S.ivf_index_retrain(grown, str(tmp_path / "nope"))


def test_ivf_index_retrain_preserves_quantized_layout(spark, sf_dir, tmp_path):
    """A quantized index retrains INTO the quantized layout: int8
    vectors table rebuilt over the current corpus, layout pin intact,
    sampled-training cap inherited from the marker."""
    vecs = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf_rt_q")
    S.ivf_index_persistent(vecs, path, quantize=True, train_sample_cap=300)
    p = S.ivf_index_retrain(vecs, path)
    assert p["quantized"] == "true"
    assert p["train_sample_cap"] == "300"  # inherited, still pinned
    stored = S._index_table(spark, path, "vectors")
    assert stored.count() == vecs.count()
    q = vecs.filter(F.col("vec_id") < 3)
    hits = S.ann_topk_ivf(
        vecs, q, index_path=path, quantize=True,
        cells=int(p["k"]), iters=int(p["iters"]),
        train_sample_cap=300,
    )
    # serves a full ranked top-k per query from the rebuilt artifact
    got = {(r["query_id"], r["rank"]) for r in hits.collect()}
    assert got == {(q, r) for q in (0, 1, 2) for r in (1, 2, 3)}


def test_cli_ann_retrain_if_drift(spark, sf_dir, tmp_path, capsys):
    """CLI wiring: --retrain-if-drift X retrains when the committed
    drift_stat exceeds X (printing the resize), is a no-op below it,
    and subsequent plain queries adopt the retrained k instead of
    refusing on the session default."""
    from haensel_ams_data_engineer_challenge_spark.__main__ import main

    docs = load_table(spark, sf_dir, "documents")
    src = docs.orderBy("doc_id").limit(1).collect()
    q = spark.createDataFrame(
        [(9001, src[0]["text"])], "query_id long, text string"
    )
    qpath = str(tmp_path / "queries")
    q.write.parquet(qpath)
    work = str(tmp_path / "wd")
    base_cli = [
        "search", "--sf-dir", sf_dir, "--work-dir", work,
        "--queries-parquet", qpath, "--k", "3", "--method", "ann",
    ]
    assert main(base_cli) == 0  # builds the index
    capsys.readouterr()
    path = f"{work}/ann_index"
    # skew-append clones of one doc's vector (new ids, one cell)
    dvecs = S.hash_embed(docs)
    one = dvecs.orderBy("vec_id").limit(1)
    skew = one.crossJoin(
        spark.range(0, 300).select(F.col("id").alias("new_id"))
    ).select(
        (F.col("new_id") + 500000).alias("vec_id"), F.col("embedding")
    )
    S.ivf_index_append(skew, path)
    drifted = float(S._read_index_params(spark, path)["drift_stat"])
    assert drifted > 1.1

    # below-threshold: no retrain happens
    assert main(base_cli + ["--retrain-if-drift", str(drifted + 1)]) == 0
    assert "retrained:" not in capsys.readouterr().out
    assert S._read_index_params(spark, path)["drift_stat"] != "1.0"

    # above-threshold: retrain over the CURRENT corpus + adopt new k
    assert main(base_cli + ["--retrain-if-drift", "1.1", "--index-stats"]) == 0
    out = capsys.readouterr().out
    assert "retrained: drift_stat=" in out
    p = S._read_index_params(spark, path)
    assert p["drift_stat"] == "1.0"
    assert int(p["k"]) == S.ivf_suggest_cells(docs.count())
    assert "drift_stat=1.0" in out  # --index-stats sees the new marker
    # a plain follow-up query serves the resized artifact
    assert main(base_cli) == 0
    assert "hits=" in capsys.readouterr().out
    # --refresh-index after the resize APPENDS at the committed shape
    # instead of silently swallowing the hyperparameter refusal
    # (review fix): the append bumps the marker version even when the
    # corpus holds nothing new
    v_before = int(S._read_index_params(spark, path)["version"])
    assert main(base_cli + ["--refresh-index"]) == 0
    p2 = S._read_index_params(spark, path)
    assert int(p2["version"]) == v_before + 1
    assert p2["k"] == p["k"]  # shape untouched by the append
