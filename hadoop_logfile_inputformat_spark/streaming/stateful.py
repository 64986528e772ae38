"""Custom stateful streaming operator via ``applyInPandasWithState``.

``session_window`` (pipelines.sessionize_stream) emits a session row
only after the watermark passes — and cannot carry arbitrary per-session
state.  This operator implements sessionization with EXPLICIT state
(mirroring reference LogfileRecordReader.java:293-319's "hold the open
record until its terminator arrives" pattern, lifted from multi-line
records to user sessions): a session closes as soon as a later event
proves the gap elapsed, and the emitted row carries custom accumulated
state (event count, value sum, first/last event types) that windowed
aggregation cannot express.

Scale shape: state is one small dict per active user key, partitioned
by user across executors (the groupBy shuffle); per micro-batch work is
Arrow-batched pandas.  Stale users are flushed by processing-time
timeout so state is bounded even for one-shot users.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Emitted (closed) session schema.
SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp,"
    " n_events bigint, sum_value double, first_type string, last_type string"
)

#: Per-user open-session state: epoch-micros bounds + accumulators.
STATE_SCHEMA = (
    "start_us bigint, last_us bigint, n_events bigint, sum_value double,"
    " first_type string, last_type string"
)

DEFAULT_GAP_S = 1800


def _close(state_tuple) -> dict:
    start_us, last_us, n, sv, ft, lt = state_tuple
    return {
        "session_start": pd.Timestamp(start_us, unit="us"),
        "session_end": pd.Timestamp(last_us, unit="us"),
        "n_events": n,
        "sum_value": round(sv, 2),
        "first_type": ft,
        "last_type": lt,
    }


def _session_fn(gap_s: int, idle_flush_ms: int | None):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed = []
        if state.hasTimedOut:
            if state.exists:
                closed.append(_close(state.get))
                state.remove()
        else:
            cur = list(state.get) if state.exists else None
            events = pd.concat(list(pdfs), ignore_index=True)
            # arrival order within a batch is not guaranteed after the
            # shuffle; event-time order is the operator's contract
            events = events.sort_values("ts")
            for row in events.itertuples(index=False):
                ts_us = int(row.ts.value // 1_000)
                if cur is not None and ts_us - cur[1] > gap_s * 1_000_000:
                    closed.append(_close(cur))
                    cur = None
                if cur is None:
                    cur = [ts_us, ts_us, 1, float(row.value),
                           row.event_type, row.event_type]
                else:
                    cur[1] = max(cur[1], ts_us)
                    cur[2] += 1
                    cur[3] += float(row.value)
                    cur[5] = row.event_type
            if cur is not None:
                state.update(tuple(cur))
                if idle_flush_ms is not None:
                    state.setTimeoutDuration(idle_flush_ms)
        if closed:
            out = pd.DataFrame(closed)
            out.insert(0, "user_id", user_id)
            yield out

    return fn


def sessionize_with_state(
    events: DataFrame,
    gap_s: int = DEFAULT_GAP_S,
    idle_flush_ms: int | None = None,
) -> DataFrame:
    """Sessionize an event stream with explicit per-user state.

    ``events`` needs columns (user_id, ts timestamp, event_type, value).
    Emits one row per CLOSED session — closed by a later event beyond
    ``gap_s`` (event-time), or, when ``idle_flush_ms`` is set, by that
    much processing-time silence for the user.  The timeout keeps state
    bounded for one-shot users in production, but makes the engine run
    continuous timeout-check batches — leave it None in tests and
    batch-drain jobs where ``processAllAvailable`` must quiesce.
    """
    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_flush_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        events.select("user_id", "ts", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_s, idle_flush_ms),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
