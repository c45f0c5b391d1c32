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


# ---------------------------------------------------------------------------
# round 9 (r8 verdict task 6): the SCORING form + the external-scorer
# CLI path, e2e against a fake local IHC API.
# ---------------------------------------------------------------------------

def test_score_chunks_returns_scores_with_audit(spark):
    from haensel_ams_data_engineer_challenge_spark.operators.external import (
        rate_limited_score_chunks,
    )

    df = spark.createDataFrame(
        [(f"c{i}", f"[{i}]") for i in range(20)],
        "conv_id string, journey_json string",
    ).coalesce(1)

    def call(chunk):
        import pandas as pd

        return pd.DataFrame(
            {
                "conv_id": chunk["conv_id"],
                "session_id": chunk["conv_id"] + "_s",
                "ihc": [1.0] * len(chunk),
            }
        )

    out = rate_limited_score_chunks(
        df, call, chunk_rows=8, rate_limit_delay=0.0
    ).collect()
    scores = [r for r in out if r["conv_id"] is not None]
    assert len(scores) == 20
    assert all(r["ok"] and r["ihc"] == 1.0 for r in scores)
    # 20 rows in chunks of 8 -> chunk sizes 8, 8, 4
    chunks = {(r["partition_id"], r["chunk_index"]): r["n_rows"] for r in out}
    assert sorted(chunks.values()) == [4, 8, 8]


def test_score_chunks_failed_chunk_recorded_not_dropped(spark):
    from haensel_ams_data_engineer_challenge_spark.operators.external import (
        rate_limited_score_chunks,
    )

    df = spark.createDataFrame(
        [(f"c{i}", "x") for i in range(10)],
        "conv_id string, journey_json string",
    ).coalesce(1)

    def call(chunk):
        import pandas as pd

        if "c5" in set(chunk["conv_id"]):
            raise IOError("endpoint down")
        return pd.DataFrame(
            {
                "conv_id": chunk["conv_id"],
                "session_id": chunk["conv_id"] + "_s",
                "ihc": [0.5] * len(chunk),
            }
        )

    out = rate_limited_score_chunks(
        df, call, chunk_rows=5, rate_limit_delay=0.0,
        max_retries=2, retry_delay=0.0,
    ).collect()
    failed = [r for r in out if not r["ok"]]
    assert len(failed) == 1
    assert failed[0]["conv_id"] is None and failed[0]["ihc"] is None
    assert failed[0]["attempts"] == 2 and "endpoint down" in failed[0]["error"]
    good = [r for r in out if r["ok"]]
    assert len(good) == 5 and all(r["ihc"] == 0.5 for r in good)


def _fake_ihc_server():
    """Threaded local HTTP server speaking the reference IHC API wire
    shape; scores every journey with the linear split (1/n per
    session) so the A2 sum invariant holds exactly like the native
    `linear` model."""
    import json
    import threading
    from collections import defaultdict
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        paths: list = []

        def do_POST(self):
            Handler.paths.append(self.path)
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n))
            groups = defaultdict(list)
            for s in body["customer_journeys"]:
                groups[s["conversion_id"]].append(s)
            value = [
                {
                    "conversion_id": cid,
                    "session_id": s["session_id"],
                    "ihc": 1.0 / len(g),
                }
                for cid, g in groups.items()
                for s in g
            ]
            resp = json.dumps({"statusCode": 200, "value": value}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(resp)))
            self.end_headers()
            self.wfile.write(resp)

        def log_message(self, *args):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, Handler


def test_cli_external_scorer_e2e(spark, sf_dir, tmp_path, capsys):
    """pipeline --scorer external: scores arrive from the (fake) API,
    land in the attribution sink identically to the native linear
    model, and the per-chunk audit table is written beside the sink."""
    from haensel_ams_data_engineer_challenge_spark.__main__ import main

    srv, handler = _fake_ihc_server()
    try:
        port = srv.server_address[1]
        work = str(tmp_path / "wd")
        rc = main([
            "pipeline", "--sf-dir", sf_dir, "--work-dir", work,
            "--scorer", "external",
            "--endpoint", f"http://127.0.0.1:{port}",
            "--rate-limit-delay", "0.01", "--chunk-journeys", "25",
            "--conv-type-id", "linear",
        ])
        assert rc == 0
        out = capsys.readouterr().out
        assert "sum_violations=0" in out

        # conv_type_id rides the query string (api_utils.py:87)
        assert handler.paths
        assert all("conv_type_id=linear" in p for p in handler.paths)

        # audit beside the sink: every chunk ok on first attempt, and
        # the chunk row counts add up to the number of journeys sent
        audit = spark.read.parquet(f"{work}/attribution_api_audit").collect()
        assert audit and all(r["ok"] and r["attempts"] == 1 for r in audit)
        n_convs = (
            spark.read.parquet(f"{work}/attribution_customer_journey")
            .select("conv_id").distinct().count()
        )
        assert sum(r["n_rows"] for r in audit) == n_convs
        assert all(r["n_rows"] <= 25 for r in audit)

        # external scores == the native linear model, row for row
        from haensel_ams_data_engineer_challenge_spark.attribution import (
            model as M,
        )
        from haensel_ams_data_engineer_challenge_spark.operators.asof import (
            journey_asof_join,
        )
        from haensel_ams_data_engineer_challenge_spark.operators.ihc import (
            attribute_by_conv_type,
        )

        native = {
            (r["conv_id"], r["session_id"], round(r["ihc"], 9))
            for r in attribute_by_conv_type(
                journey_asof_join(
                    M.sessions(spark, sf_dir), M.conversions(spark, sf_dir)
                ),
                "linear",
            ).select("conv_id", "session_id", "ihc").collect()
        }
        got = {
            (r["conv_id"], r["session_id"], round(r["ihc"], 9))
            for r in spark.read.parquet(
                f"{work}/attribution_customer_journey"
            ).collect()
        }
        assert got == native
    finally:
        srv.shutdown()
