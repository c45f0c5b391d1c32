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
            ok, err = False, None
            while attempts < max_retries and not ok:
                if first_call_done:
                    # the reference sleeps BETWEEN requests (after a
                    # response, before the next), not before the first
                    time.sleep(rate_limit_delay if attempts == 0 else retry_delay)
                attempts += 1
                first_call_done = True
                try:
                    call(chunk)
                    ok, err = True, None
                except Exception as e:  # noqa: BLE001 — recorded, not dropped
                    err = f"{type(e).__name__}: {e}"
            if not ok and fail_fast:
                raise RuntimeError(
                    f"chunk {chunk_index} of partition {pid} failed after "
                    f"{attempts} attempts: {err}"
                )
            row = pd.DataFrame(
                {
                    "partition_id": [pid],
                    "chunk_index": [chunk_index],
                    "n_rows": [n],
                    "attempts": [attempts],
                    "ok": [ok],
                    "error": [err],
                }
            )
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

    return df.mapInPandas(run, RESULT_SCHEMA)
