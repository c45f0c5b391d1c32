"""Throttled external-call operator — the reference's P3 shape
(api_utils.py: chunked requests, an inter-request rate-limit sleep,
bounded retries with a fixed delay, log-and-continue on a chunk that
exhausts its retries; see api_utils.py:101-138 retry loop,
api_utils.py:171-212 chunk loop, main.py:65-70 --rate_limit_delay)
kept as a GENERIC operator.

The engine scores IHC natively (SURVEY.md §2.9), so nothing in the
registered pipeline calls out — but a reference user migrating a
different external dependency (enrichment API, moderation endpoint,
embedding service) needs the same disciplined shape, Spark-first:

- the call runs INSIDE mapInPandas (Arrow batches), so it is an
  auditable TRANSFORM, not a fire-and-forget foreachPartition: every
  chunk yields a result row (partition, chunk, n_rows, attempts, ok,
  error) the caller can count, quarantine-join, or alert on — dropped
  work is always observable (the jsonl-source discipline applied to
  side effects).
- rate limiting is PER PARTITION (a token interval between calls, the
  reference's inter-chunk sleep).  A cluster-global budget is the
  caller's partition count: global rate = partitions x (1 / delay), so
  ``df.repartition(rate_budget * delay)`` bounds it — coordinating a
  shared limiter across executors would serialize the cluster on an
  external lock, which is exactly what a 1000-executor job must not
  do.  At the reference's scale (one process) the two models coincide.
- retries mirror the reference: ``max_retries`` attempts, fixed
  ``retry_delay`` between them, and a chunk that still fails is
  RECORDED (ok=false + message) while later chunks proceed
  (api_utils.py:209-211 "Continue with next chunk").  ``fail_fast``
  flips that to raise-on-first-failure for transactional callers.

The callable must be a plain picklable function (it ships to
executors); it receives one pandas DataFrame per chunk.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

RESULT_SCHEMA = (
    "partition_id int, chunk_index long, n_rows long, "
    "attempts int, ok boolean, error string"
)


def _chunk_loop(
    call: Callable,
    chunk_rows: int,
    rate_limit_delay: float,
    max_retries: int,
    retry_delay: float,
    fail_fast: bool,
    emit: Callable,
):
    """The ONE chunk-buffering / throttle / retry skeleton behind both
    chunk operators (audit-only and scoring) — a fix to its subtleties
    (the sleep-before-retry branch, the fail_fast contract) lands in
    both by construction.  ``emit(pid, chunk_index, n_rows, attempts,
    ok, error, result) -> pandas.DataFrame`` renders each chunk's
    outcome; ``result`` is ``call``'s return value (None on failure).
    """

    def run(batches):
        import time

        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        buf: list = []
        n_buf = 0
        chunk_index = 0
        first_call_done = False

        def flush(frames, n):
            nonlocal chunk_index, first_call_done
            chunk = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
            attempts = 0
            ok, err, result = False, None, None
            while attempts < max_retries and not ok:
                if first_call_done:
                    # the reference sleeps BETWEEN requests (after a
                    # response, before the next), not before the first
                    time.sleep(rate_limit_delay if attempts == 0 else retry_delay)
                attempts += 1
                first_call_done = True
                try:
                    result = call(chunk)
                    ok, err = True, None
                except Exception as e:  # noqa: BLE001 — recorded, not dropped
                    err = f"{type(e).__name__}: {e}"
            if not ok and fail_fast:
                raise RuntimeError(
                    f"chunk {chunk_index} of partition {pid} failed after "
                    f"{attempts} attempts: {err}"
                )
            row = emit(pid, chunk_index, n, attempts, ok, err, result)
            chunk_index += 1
            return row

        for pdf in batches:
            start = 0
            while start < len(pdf):
                take = min(chunk_rows - n_buf, len(pdf) - start)
                buf.append(pdf.iloc[start : start + take])
                n_buf += take
                start += take
                if n_buf == chunk_rows:
                    yield flush(buf, n_buf)
                    buf, n_buf = [], 0
        if n_buf:
            yield flush(buf, n_buf)

    return run


def rate_limited_call_chunks(
    df: DataFrame,
    call: Callable,
    chunk_rows: int = 100,
    rate_limit_delay: float = 1.0,
    max_retries: int = 3,
    retry_delay: float = 2.0,
    fail_fast: bool = False,
) -> DataFrame:
    """Apply ``call(pandas_chunk)`` to ``df`` in chunks of at most
    ``chunk_rows`` rows with per-partition throttling and bounded
    retries.  Returns the per-chunk audit table (``RESULT_SCHEMA``) —
    an action on it drives the calls.

    Defaults mirror the reference: 100-row chunks
    (journey_builder.py:185 ``max_journeys_per_chunk``), 1.0 s
    inter-request delay (main.py:65-70), 3 retries x 2 s
    (config.py:17-18).
    """
    if chunk_rows < 1:
        raise ValueError(f"chunk_rows must be >= 1, got {chunk_rows}")
    if max_retries < 1:
        raise ValueError(f"max_retries must be >= 1, got {max_retries}")

    def emit(pid, chunk_index, n, attempts, ok, err, _result):
        import pandas as pd

        return pd.DataFrame(
            {
                "partition_id": [pid],
                "chunk_index": [chunk_index],
                "n_rows": [n],
                "attempts": [attempts],
                "ok": [ok],
                "error": [err],
            }
        )

    return df.mapInPandas(
        _chunk_loop(
            call, chunk_rows, rate_limit_delay, max_retries, retry_delay,
            fail_fast, emit,
        ),
        RESULT_SCHEMA,
    )


#: rate_limited_score_chunks output: the score triplet + the chunk's
#: audit columns on every row.  A failed (or empty-response) chunk
#: contributes ONE row with NULL scores, so data and failures live in
#: the same observable stream.
SCORE_RESULT_SCHEMA = "conv_id string, session_id string, ihc double, " + RESULT_SCHEMA


def rate_limited_score_chunks(
    df: DataFrame,
    call: Callable,
    chunk_rows: int = 100,
    rate_limit_delay: float = 1.0,
    max_retries: int = 3,
    retry_delay: float = 2.0,
    fail_fast: bool = False,
) -> DataFrame:
    """The round-9 SCORING form of :func:`rate_limited_call_chunks`
    (same chunking, throttle and retry discipline): ``call(chunk)``
    RETURNS a pandas DataFrame of (conv_id, session_id, ihc) scores,
    which flow back into the engine as rows — the reference's external
    IHC scorer surface (api_utils.py:171-212 ``send_journeys_to_api``,
    main.py:65-70 ``--rate_limit_delay``) as an auditable transform.

    ``df`` is expected to carry ONE COMPLETE JOURNEY PER ROW (the
    ``journeys_as_api_payload`` shape), so row-chunking can never
    split a conversion across two requests — the invariant
    journey_builder.py:185 (``max_journeys_per_chunk``) keeps by
    construction.

    Output (``SCORE_RESULT_SCHEMA``): one row per returned score, each
    carrying its chunk's audit columns; a chunk that fails after
    ``max_retries`` (or returns no scores) yields one NULL-score row.
    Callers split the stream: ``filter(ok AND conv_id IS NOT NULL)``
    for the scores, ``select(audit cols).distinct()`` for the
    per-chunk audit table — and MUST materialize it before consuming
    twice, or the external calls re-run per action.
    """
    if chunk_rows < 1:
        raise ValueError(f"chunk_rows must be >= 1, got {chunk_rows}")
    if max_retries < 1:
        raise ValueError(f"max_retries must be >= 1, got {max_retries}")

    def emit(pid, chunk_index, n, attempts, ok, err, scores):
        import pandas as pd

        if ok and scores is not None and len(scores) > 0:
            out = pd.DataFrame(
                {
                    "conv_id": scores["conv_id"].astype(str),
                    "session_id": scores["session_id"].astype(str),
                    "ihc": scores["ihc"].astype(float),
                }
            )
        else:
            out = pd.DataFrame(
                {"conv_id": [None], "session_id": [None], "ihc": [None]}
            )
        out["partition_id"] = pid
        out["chunk_index"] = chunk_index
        out["n_rows"] = n
        out["attempts"] = attempts
        out["ok"] = ok
        out["error"] = err
        return out

    return df.mapInPandas(
        _chunk_loop(
            call, chunk_rows, rate_limit_delay, max_retries, retry_delay,
            fail_fast, emit,
        ),
        SCORE_RESULT_SCHEMA,
    )


def http_ihc_scorer(
    endpoint: str,
    conv_type_id: str = "ihc",
    api_key: str | None = None,
    timeout: float = 30.0,
) -> Callable:
    """A picklable ``call`` for :func:`rate_limited_score_chunks`
    speaking the reference IHC API wire protocol (api_utils.py:87-135):

    POST ``{endpoint}/compute_ihc?conv_type_id=...`` with body
    ``{"customer_journeys": [session dicts...]}`` (the chunk's
    ``journey_json`` rows, flattened) and headers Content-Type +
    x-api-key; response ``{"statusCode": 200|206, "value":
    [{"conversion_id", "session_id", "ihc"}, ...]}`` — a non-2xx
    statusCode raises (retried by the chunk loop, like the
    reference's raise-on-API-error, api_utils.py:115-118).

    stdlib urllib only — the executor side must not depend on
    ``requests``.
    """

    def call(pdf):
        import json
        import urllib.request

        import pandas as pd

        journeys = []
        for j in pdf["journey_json"]:
            journeys.extend(json.loads(j))
        body = json.dumps({"customer_journeys": journeys}).encode("utf-8")
        headers = {"Content-Type": "application/json"}
        if api_key is not None:
            headers["x-api-key"] = api_key
        req = urllib.request.Request(
            f"{endpoint}/compute_ihc?conv_type_id={conv_type_id}",
            data=body, headers=headers, method="POST",
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            result = json.loads(resp.read().decode("utf-8"))
        if result.get("statusCode") not in (200, 206):
            raise ValueError(
                f"API error: {result.get('statusCode')} - "
                f"{result.get('message', 'Unknown error')}"
            )
        vals = result.get("value", [])
        return pd.DataFrame(
            {
                "conv_id": [str(v["conversion_id"]) for v in vals],
                "session_id": [str(v["session_id"]) for v in vals],
                "ihc": [float(v["ihc"]) for v in vals],
            }
        )

    return call
