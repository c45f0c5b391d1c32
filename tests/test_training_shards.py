"""Trainer-shard sink: deterministic content-addressed sharding,
lossless round-trip, reproducible manifest (round 8 — the last mile
after pack_sequences)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from haensel_ams_data_engineer_challenge_spark.operators.pack import (
    pack_sequences,
)
from haensel_ams_data_engineer_challenge_spark.operators.sinks import (
    write_training_shards,
)
from haensel_ams_data_engineer_challenge_spark.sources import load_table


@pytest.fixture(scope="module")
def packed(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(docs, seq_len=128).cache()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_shards_round_trip_losslessly(spark, packed, tmp_path):
    out = str(tmp_path / "out")
    write_training_shards(packed, out, 8, token_col="n_tokens")
    back = spark.read.parquet(f"{out}/shards")
    assert _rows(back.drop("shard")) == _rows(packed)


def test_shard_assignment_deterministic_and_balanced(spark, packed, tmp_path):
    m1 = write_training_shards(packed, str(tmp_path / "a"), 8).collect()
    # different input partitioning -> identical manifest (shard sizes
    # AND content hashes), proving content-addressed assignment
    m2 = write_training_shards(
        packed.repartition(17), str(tmp_path / "b"), 8
    ).collect()
    assert [tuple(r) for r in m1] == [tuple(r) for r in m2]
    sizes = [r["n_rows"] for r in m1]
    assert len(sizes) == 8 and min(sizes) > 0
    assert max(sizes) < 2.5 * (sum(sizes) / len(sizes))  # hash balance


def test_manifest_matches_shard_contents(spark, packed, tmp_path):
    out = str(tmp_path / "out")
    manifest = {r["shard"]: r for r in
                write_training_shards(packed, out, 4, token_col="n_tokens").collect()}
    back = spark.read.parquet(f"{out}/shards")
    cols = [c for c in back.columns if c != "shard"]
    check = (
        back.withColumn("__h", F.xxhash64(*[F.col(c) for c in cols]))
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("t"),
             F.expr("bit_xor(__h)").alias("h"))
    )
    for r in check.collect():
        m = manifest[r["shard"]]
        assert (m["n_rows"], m["n_tokens"], m["content_hash"]) == (
            r["n"], r["t"], r["h"]
        )


def test_one_file_per_shard_layout(spark, packed, tmp_path):
    import glob

    out = str(tmp_path / "out")
    write_training_shards(packed, out, 4)
    for i in {r["shard"] for r in spark.read.parquet(f"{out}/shards").select("shard").distinct().collect()}:
        files = glob.glob(f"{out}/shards/shard={i}/*.parquet")
        assert len(files) == 1, (i, files)


def test_validation(spark, packed, tmp_path):
    with pytest.raises(ValueError, match="n_shards"):
        write_training_shards(packed, str(tmp_path / "x"), 0)
