"""Stateful streaming sessionization (applyInPandasWithState).

The batch twin is ``operators/sessionize.py``; this operator keeps
per-user state (last event time, running session count) across
micro-batches so session keys stay consistent as events arrive over
time — the semantics the batch lag-window computes in one pass.

State is two scalars per user — bounded by user cardinality, the
canonical keyed-state shape. Within a micro-batch, events are sorted
by (ts, event_id) before applying the gap rule, matching the batch
window order exactly.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.sessionize import DEFAULT_GAP_SECONDS

OUTPUT_SCHEMA = "event_id long, user_id long, ts timestamp, session_key string"
STATE_SCHEMA = "last_epoch long, session_no long"


def _session_fn_factory(gap_seconds: int):
    def assign_sessions(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last_epoch, session_no = state.get
        else:
            last_epoch, session_no = None, 0
        batch = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        # truncate to epoch seconds — the shared gap contract with the
        # batch operator (operators/sessionize.py docstring)
        epochs = (batch["ts"].astype("int64") // 1_000_000_000).tolist()
        keys = []
        for ep in epochs:
            if last_epoch is None or (ep - last_epoch) > gap_seconds:
                session_no += 1
            last_epoch = ep
            keys.append(f"{user_id}-{session_no}")
        state.update((last_epoch, session_no))
        out = batch[["event_id", "user_id", "ts"]].copy()
        out["session_key"] = keys
        yield out

    return assign_sessions


def streaming_sessionize(
    events: DataFrame, gap_seconds: int = DEFAULT_GAP_SECONDS
) -> DataFrame:
    """Assign session keys on a stream of (event_id, user_id, ts)."""
    return (
        events.select("event_id", "user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn_factory(gap_seconds),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
