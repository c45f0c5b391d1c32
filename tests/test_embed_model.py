"""Batched model-inference seam (operators/embed.py, round 10).

What the seam must guarantee:
- the reference encoder ("synproj-v1") is bit-reproducible by a plain
  python model (tokens -> synonym canon -> trained stop filter ->
  signed md5 projection);
- the encoder artifact loads ONCE PER PYTHON WORKER, never per task or
  per Arrow batch (the load-log pin);
- the artifact marker protocol guards the seam (missing artifact
  raises driver-side; hyperparameter mismatch raises at build);
- the semantic property hash_embed provably lacks: synonym-swapped
  paraphrases land on the SAME vector under the model encoder while
  staying below every dup threshold under hash_embed.
"""

from __future__ import annotations

import glob
import hashlib
import re

import pytest
from pyspark.sql import functions as F

from haensel_ams_data_engineer_challenge_spark.operators import embed as E
from haensel_ams_data_engineer_challenge_spark.operators import similarity as S


def _py_model_vec(text: str, syn: dict, stop: set, dim: int):
    acc = {}
    kept = 0
    for t in re.findall(r"[a-z0-9]+", text.lower()):
        c = syn.get(t, t)
        if c in stop:
            continue
        kept += 1
        b = int(hashlib.md5(f"em|{c}".encode()).hexdigest()[:15], 16) % dim
        s = 1 if int(hashlib.md5(f"es|{c}".encode()).hexdigest()[:1], 16) % 2 == 0 else -1
        acc[b] = acc.get(b, 0) + s
    if kept == 0:
        return None
    return [float(acc.get(i, 0)) for i in range(dim)]


def test_embed_model_matches_python_reference(spark, tmp_path):
    rows = [
        (1, "the quick cat sat on the mat"),
        (2, "a rapid dog jumps over fences"),
        (3, "completely unrelated words here"),
        (4, "???"),  # no tokens -> absent
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "enc")
    dim = 16
    E.encoder_model_build(docs, path, dim=dim, stop_top_n=0)
    got = {
        r["vec_id"]: list(r["embedding"])
        for r in E.embed_with_model(docs, path).collect()
    }
    assert set(got) == {1, 2, 3}
    for i, text in rows[:3]:
        assert got[i] == _py_model_vec(
            text, E.DEFAULT_SYNONYMS, set(), dim
        ), i
    # synonyms actually canonicalize: 'quick' and 'rapid' hit the SAME
    # bucket ('fast') — their singleton docs would otherwise differ
    v_quick = _py_model_vec("quick", E.DEFAULT_SYNONYMS, set(), dim)
    v_fast = _py_model_vec("fast", {}, set(), dim)
    assert v_quick == v_fast


def test_trained_stop_list_drops_top_terms(spark, tmp_path):
    """stop_top_n=1 on a corpus where 'filler' dominates: two docs
    differing only in their 'filler' count embed identically."""
    rows = [
        (1, "filler filler filler filler alpha beta"),
        (2, "filler alpha beta"),
        (3, "filler filler filler gamma"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "enc")
    E.encoder_model_build(docs, path, dim=16, stop_top_n=1, synonyms={})
    got = {
        r["vec_id"]: list(r["embedding"])
        for r in E.embed_with_model(docs, path).collect()
    }
    assert got[1] == got[2]
    assert got[1] != got[3]
    # a doc that is ONLY stop terms is absent (zero kept tokens)
    only_stop = spark.createDataFrame(
        [(9, "filler filler")], "doc_id long, text string"
    )
    assert E.embed_with_model(only_stop, path).count() == 0


def test_encoder_loads_once_per_worker_not_per_task(spark, tmp_path):
    """The executor-side cache: 8 partitions x 2 runs = 16 tasks on a
    local[4] session (<= 4 python workers).  Loads are logged by the
    operator itself; the log must stay at worker-count, strictly below
    task count — one load per worker, not per task/batch."""
    rows = [(i, f"token{i} alpha beta gamma delta") for i in range(64)]
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    path = str(tmp_path / "enc")
    log_dir = str(tmp_path / "loads")
    E.encoder_model_build(docs, path, stop_top_n=0)
    for _ in range(2):
        assert E.embed_with_model(docs, path, load_log_dir=log_dir).count() == 64
    loads = glob.glob(f"{log_dir}/*.loaded")
    assert 1 <= len(loads) <= 4, loads  # <= local[4] workers, << 16 tasks
    # distinct pids bound the loads exactly: one load per worker process
    pids = {f.rsplit("-", 1)[1].split(".")[0] for f in loads}
    assert len(loads) == len(pids), loads


def test_encoder_artifact_guards(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "alpha beta")], "doc_id long, text string"
    )
    # missing artifact raises DRIVER-side, before any task
    with pytest.raises(ValueError, match="no committed encoder"):
        E.embed_with_model(docs, str(tmp_path / "nope"))
    # hyperparameter mismatch at build raises (never silently serves)
    path = str(tmp_path / "enc")
    E.encoder_model_build(docs, path, dim=16, stop_top_n=0)
    with pytest.raises(ValueError, match="built with"):
        E.encoder_model_build(docs, path, dim=32, stop_top_n=0)
    # rebuild-free reuse: second identical build is a committed no-op
    E.encoder_model_build(docs, path, dim=16, stop_top_n=0)
    assert E.embed_with_model(docs, path).count() == 1
    # ensure() serves a pre-built artifact regardless of the builder
    # defaults (bring-your-own-artifact contract)...
    E.encoder_model_ensure(docs, path)
    assert E.embed_with_model(docs, path).count() == 1
    # ...but still refuses a committed artifact of another kind
    from haensel_ams_data_engineer_challenge_spark.operators.similarity import (
        _write_index_params,
    )

    other = str(tmp_path / "notenc")
    _write_index_params(spark, other, {"kind": "lsh"})
    with pytest.raises(ValueError, match="not a synproj-v1 encoder"):
        E.encoder_model_ensure(docs, other)


PARAPHRASE_A = "the quick brown fox jumps over the lazy dog"
PARAPHRASE_B = "the rapid brown fox hops over the sluggish dog"


def test_paraphrase_pair_model_catches_hash_embed_misses(spark, tmp_path):
    """The honest semantic claim, proven by contrast: a synonym-swapped
    paraphrase pair is INVISIBLE to hash_embed at the 0.9 dup
    threshold but cosine-identical under the model encoder."""
    docs = spark.createDataFrame(
        [(1, PARAPHRASE_A), (2, PARAPHRASE_B)], "doc_id long, text string"
    )
    path = str(tmp_path / "enc")
    E.encoder_model_build(docs, path, stop_top_n=0)

    def pair_cosine(vecs):
        a = vecs.filter("vec_id = 1").select(
            F.col("embedding").alias("__va")
        )
        b = vecs.filter("vec_id = 2").select(
            F.col("embedding").alias("__vb")
        )
        return a.crossJoin(b).select(
            S.cosine_expr("__va", "__vb").alias("c")
        ).collect()[0]["c"]

    model_cos = pair_cosine(E.embed_with_model(docs, path))
    hash_cos = pair_cosine(S.hash_embed(docs))
    # identical canonical token multisets -> same vector (cosine 1.0
    # up to the sqrt ulp; never assert == 1.0)
    assert model_cos == pytest.approx(1.0, abs=1e-12)
    assert model_cos >= 0.9  # clears the model arm's dup threshold
    assert hash_cos < 0.9    # hash_embed provably misses the pair

    # ... and through the ACTUAL banded near-dup machinery (the
    # registry arms' exact shape): the model arm finds the pair, the
    # hashed arm does not — the recall floor for the paraphrase class
    def lsh_pairs(vecs):
        return {
            (r["id_a"], r["id_b"])
            for r in S.embedding_dup_pairs_lsh(vecs, threshold=0.9).collect()
        }

    assert (1, 2) in lsh_pairs(E.embed_with_model(docs, path))
    assert (1, 2) not in lsh_pairs(S.hash_embed(docs))


def test_encoder_version_tracks_trained_content(spark, tmp_path):
    """Review fix: the artifact version is a CONTENT hash of the
    trained tables — a rebuild from different data changes it (so the
    worker cache and index embedder pins go stale), an identical
    retrain keeps it (same tables = same vector space)."""
    import shutil

    from haensel_ams_data_engineer_challenge_spark.operators.similarity import (
        _read_index_params,
    )

    d1 = spark.createDataFrame(
        [(1, "aaa aaa bbb ccc")], "doc_id long, text string"
    )
    d2 = spark.createDataFrame(
        [(1, "zzz zzz bbb ccc")], "doc_id long, text string"
    )
    path = str(tmp_path / "enc")
    E.encoder_model_build(d1, path, stop_top_n=1)
    v1 = _read_index_params(spark, path)["version"]
    shutil.rmtree(path)
    E.encoder_model_build(d2, path, stop_top_n=1)  # stop list: zzz not aaa
    v2 = _read_index_params(spark, path)["version"]
    assert v1 != v2
    # the rebuilt model is actually SERVED (not a stale worker cache):
    # 'zzz' is now stopped, so a zzz-only doc has no vector
    probe = spark.createDataFrame([(9, "zzz zzz")], "doc_id long, text string")
    assert E.embed_with_model(probe, path).count() == 0
    shutil.rmtree(path)
    E.encoder_model_build(d1, path, stop_top_n=1)  # identical retrain
    assert _read_index_params(spark, path)["version"] == v1
