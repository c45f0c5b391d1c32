"""Manifest-committed index artifacts (operators/artifact_manifest.py,
round 12 — r11 verdict task 4): the test_manifest_sink matrix applied
to the ANN and MinHash index kinds, plus legacy-layout adoption.

Mid-compaction readers and torn builds are pinned in
test_minhash_index.py / test_ann_index.py next to their operators;
this file pins the protocol itself: crash-before-commit atomicity,
generation vacuum, and the legacy (params-parquet + bare table dirs)
upgrade path."""

from __future__ import annotations

import glob

import pytest

from haensel_ams_data_engineer_challenge_spark.operators import (
    artifact_manifest as AM,
)
from haensel_ams_data_engineer_challenge_spark.operators import (
    minhash_index as MI,
)
from haensel_ams_data_engineer_challenge_spark.operators import (
    similarity as S,
)
from haensel_ams_data_engineer_challenge_spark.sources import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _legacy_lsh_artifact(spark, vecs, path, tables=8, planes=6):
    """Hand-build a pre-round-12 LSH artifact: bare table dir + params
    parquet written last (the old marker protocol)."""
    S.banded_bucket_rows(
        vecs, "vec_id", "embedding", tables, planes
    ).write.mode("overwrite").parquet(f"{path}/buckets")
    S._write_index_params(
        spark, path,
        {
            "kind": "lsh", "tables": tables, "planes_per_table": planes,
            "id_col": "vec_id", "vec_col": "embedding",
            "quantized": "false", "version": 1,
        },
    )


def test_legacy_lsh_artifact_readable_and_upgraded_by_append(
    spark, sf_dir, tmp_path
):
    """Old-layout artifacts stay readable; the first mutating op adopts
    them in place — current files become manifest content, the legacy
    params ride into the manifest body, the legacy marker dir is
    dropped, and the grown store equals a from-scratch rebuild."""
    vecs = load_table(spark, sf_dir, "embeddings")
    old = vecs.filter("vec_id % 5 != 0")
    new = vecs.filter("vec_id % 5 = 0")
    path = str(tmp_path / "legacy_lsh")
    _legacy_lsh_artifact(spark, old, path)

    # readable as-is: params resolve through the legacy fallback,
    # the table read falls back to the bare dir
    assert S._read_index_params(spark, path)["kind"] == "lsh"
    n_legacy = S._index_table(spark, path, "buckets").count()
    assert n_legacy > 0
    assert AM.artifact_resolve(spark, path) is None  # not yet adopted

    # persistent() serves the committed legacy artifact without rebuild
    served = S.lsh_index_persistent(old, path, tables=8, planes_per_table=6)
    assert served.count() == n_legacy

    # the append ADOPTS: manifest appears, params carried, marker gone
    S.lsh_index_append(new, path, tables=8, planes_per_table=6)
    v, man = AM.artifact_resolve(spark, path)
    assert man["params"]["kind"] == "lsh"
    assert int(man["params"]["version"]) == 2
    assert not glob.glob(f"{path}/params/*")  # legacy marker dropped

    scratch = str(tmp_path / "scratch_lsh")
    S.lsh_index_persistent(vecs, scratch, tables=8, planes_per_table=6)
    assert _rows(S._index_table(spark, path, "buckets")) == _rows(
        S._index_table(spark, scratch, "buckets")
    )


def test_legacy_minhash_compact_adopts_then_compacts(spark, tmp_path):
    """Compacting an old-layout MinHash artifact upgrades it in place
    first (adoption commit), then compacts under the manifest — rows
    identical, one file, no torn window."""
    docs = spark.createDataFrame(
        [(i, f"doc {i} " + " ".join(f"w{i}{k}" for k in range(12)))
         for i in range(30)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "legacy_mh")
    from haensel_ams_data_engineer_challenge_spark.operators.dedup import (
        minhash_bands,
    )

    minhash_bands(docs, "text", "doc_id").write.mode("overwrite").parquet(
        f"{path}/bands"
    )
    S._write_index_params(
        spark, path,
        {"kind": "minhash", "k": 12, "band_size": 3, "shingle_n": 3},
    )
    before = _rows(S._index_table(spark, path, "bands"))
    n = MI.minhash_index_compact(spark, path, target_partitions=1)
    assert n == len(before)
    _, man = AM.artifact_resolve(spark, path)
    assert len(man["tables"]["bands"]["files"]) == 1
    assert man["params"]["kind"] == "minhash"
    assert _rows(S._index_table(spark, path, "bands")) == before


def test_build_crash_before_commit_leaves_nothing_visible(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Crash matrix, build side: dying before the manifest rename
    leaves NO committed artifact (staged/moved files are invisible
    orphans); the retry builds cleanly and vacuums them."""
    vecs = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf_crash")

    real = AM._commit_json

    def boom(*a, **kw):
        raise RuntimeError("injected crash before manifest rename")

    monkeypatch.setattr(AM, "_commit_json", boom)
    with pytest.raises(RuntimeError, match="injected"):
        S.ivf_index_persistent(vecs, path, k=5)
    monkeypatch.setattr(AM, "_commit_json", real)

    assert AM.artifact_resolve(spark, path) is None
    assert S._read_index_params(spark, path) == {}
    # retry: clean build over the orphans; reads resolve exactly the
    # committed files (orphans invisible, then vacuumed)
    a, c = S.ivf_index_persistent(vecs, path, k=5)
    assert a.count() == vecs.count()
    _, man = AM.artifact_resolve(spark, path)
    committed = {
        f"assignments/{n}" for n in man["tables"]["assignments"]["files"]
    }
    on_disk = {
        f"assignments/{p.rsplit('/', 1)[-1]}"
        for p in glob.glob(f"{path}/assignments/*.parquet")
    }
    assert committed <= on_disk  # orphans may linger until a mutation
    # a lease-holding vacuum reclaims them
    from haensel_ams_data_engineer_challenge_spark.operators.sinks import (
        hold_writer_lease,
    )

    with hold_writer_lease(spark, path):
        AM.artifact_vacuum(spark, path)
    on_disk_after = {
        f"assignments/{p.rsplit('/', 1)[-1]}"
        for p in glob.glob(f"{path}/assignments/*.parquet")
    }
    assert on_disk_after == committed


def test_vacuum_retains_one_generation(spark, sf_dir, tmp_path):
    """A superseded generation's files survive exactly one further
    mutation (readers of the previous manifest stay whole), then are
    reclaimed — the sink's retention rule on the table-dir layout."""
    vecs = load_table(spark, sf_dir, "embeddings")
    old = vecs.filter("vec_id % 3 = 0")
    path = str(tmp_path / "lsh_gen")
    S.lsh_index_persistent(old, path, tables=4, planes_per_table=6)
    _, man1 = AM.artifact_resolve(spark, path)
    gen1 = set(man1["tables"]["buckets"]["files"])

    # compact supersedes gen1; its files must survive (v1 readers)
    from haensel_ams_data_engineer_challenge_spark.operators.sinks import (
        hold_writer_lease,
    )

    n = AM.artifact_compact(spark, path, target_partitions=1)
    assert n > 0
    on_disk = {
        p.rsplit("/", 1)[-1] for p in glob.glob(f"{path}/buckets/*.parquet")
    }
    assert gen1 <= on_disk

    # the next mutation ages gen1 out
    S.lsh_index_append(
        vecs.filter("vec_id % 3 = 1"), path, tables=4, planes_per_table=6
    )
    with hold_writer_lease(spark, path):
        AM.artifact_vacuum(spark, path)
    on_disk = {
        p.rsplit("/", 1)[-1] for p in glob.glob(f"{path}/buckets/*.parquet")
    }
    assert not (gen1 & on_disk)
    # and the served store is complete
    served = S._index_table(spark, path, "buckets")
    assert served.select("vec_id").distinct().count() == (
        vecs.filter("vec_id % 3 = 0").count()
        + vecs.filter("vec_id % 3 = 1").count()
    )


def test_sink_and_artifact_manifests_refuse_to_mix(spark, tmp_path):
    """An index-artifact resolver pointed at a SINK manifest refuses
    loudly instead of misreading the body."""
    from haensel_ams_data_engineer_challenge_spark.operators import (
        manifest_sink as MS,
    )

    path = str(tmp_path / "sink")
    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    MS.manifest_insert_if_absent(spark, df, path, ["k"])
    with pytest.raises(ValueError, match="SINK manifest"):
        AM.artifact_resolve(spark, path)
