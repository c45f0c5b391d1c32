"""Throttled external-call operator (reference P3 shape): chunking,
retries, record-and-continue, per-partition throttling."""

from __future__ import annotations

import glob
import os
import time

import pytest

from haensel_ams_data_engineer_challenge_spark.operators.external import (
    rate_limited_call_chunks,
)


def _docs(spark, n=250):
    return spark.range(n).selectExpr("id AS doc_id", "concat('t', id) AS text")


def test_chunks_cover_all_rows_once(spark, tmp_path):
    out = str(tmp_path)

    def call(chunk):
        ids = sorted(chunk["doc_id"].tolist())
        with open(os.path.join(out, f"c_{ids[0]}_{os.getpid()}_{time.monotonic_ns()}"), "w") as f:
            f.write(",".join(map(str, ids)))

    df = _docs(spark).repartition(3)
    audit = rate_limited_call_chunks(
        df, call, chunk_rows=40, rate_limit_delay=0.0
    ).collect()
    seen = []
    for p in glob.glob(f"{out}/c_*"):
        seen.extend(int(x) for x in open(p).read().split(","))
    assert sorted(seen) == list(range(250))          # every row exactly once
    assert sum(r["n_rows"] for r in audit) == 250
    assert all(r["ok"] and r["attempts"] == 1 and r["error"] is None for r in audit)
    assert max(r["n_rows"] for r in audit) <= 40


def test_retry_then_succeed_is_audited(spark, tmp_path):
    out = str(tmp_path)

    def call(chunk):
        key = os.path.join(out, f"m_{int(chunk['doc_id'].min())}")
        if not os.path.exists(key):
            open(key, "w").close()
            raise IOError("transient")

    df = _docs(spark, 50).coalesce(1)
    audit = rate_limited_call_chunks(
        df, call, chunk_rows=25, rate_limit_delay=0.0, retry_delay=0.0
    ).collect()
    assert [r["attempts"] for r in audit] == [2, 2]
    assert all(r["ok"] for r in audit)


def test_exhausted_retries_record_and_continue(spark):
    def call(chunk):
        if int(chunk["doc_id"].min()) == 0:
            raise ValueError("permanent failure")

    df = _docs(spark, 50).coalesce(1)
    audit = rate_limited_call_chunks(
        df, call, chunk_rows=25, rate_limit_delay=0.0,
        max_retries=3, retry_delay=0.0,
    ).collect()
    by_chunk = {r["chunk_index"]: r for r in audit}
    bad, good = by_chunk[0], by_chunk[1]
    assert not bad["ok"] and bad["attempts"] == 3
    assert "permanent failure" in bad["error"]
    assert good["ok"]                     # later chunks still processed


def test_fail_fast_raises(spark):
    def call(chunk):
        raise ValueError("down")

    df = _docs(spark, 10).coalesce(1)
    with pytest.raises(Exception, match="failed after"):
        rate_limited_call_chunks(
            df, call, chunk_rows=5, rate_limit_delay=0.0,
            max_retries=2, retry_delay=0.0, fail_fast=True,
        ).collect()


def test_inter_request_throttle(spark):
    def call(chunk):
        pass

    df = _docs(spark, 60).coalesce(1)
    t0 = time.perf_counter()
    audit = rate_limited_call_chunks(
        df, call, chunk_rows=20, rate_limit_delay=0.15
    ).collect()
    elapsed = time.perf_counter() - t0
    assert len(audit) == 3
    assert elapsed >= 0.3                 # 2 inter-request gaps, not 3


def test_validation(spark):
    df = _docs(spark, 5)
    with pytest.raises(ValueError, match="chunk_rows"):
        rate_limited_call_chunks(df, lambda c: None, chunk_rows=0)
    with pytest.raises(ValueError, match="max_retries"):
        rate_limited_call_chunks(df, lambda c: None, max_retries=0)
