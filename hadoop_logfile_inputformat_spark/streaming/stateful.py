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

#: Session confs selecting the RocksDB state store provider — the
#: 100 TB default for stateful streaming.  The HDFS-backed default
#: keeps every key's state in EXECUTOR HEAP between batches: at
#: millions of open sessions per executor that is an OOM, not a tuning
#: problem.  RocksDB keeps state on local SSD with a block-cache tier,
#: bounding heap by cache size instead of keyspace; changelog
#: checkpointing ships per-batch deltas instead of full SST snapshots.
#: Apply BEFORE the query starts (``for k, v in
#: ROCKSDB_STATE_CONFS.items(): spark.conf.set(k, v)``) — the provider
#: is fixed per query at start.  Ships with the stock Spark
#: distribution (no extra jars); exercised in tests/test_streaming.py.
ROCKSDB_STATE_CONFS = {
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
    # surface numRowsTotal in StreamingQueryProgress.stateOperators so
    # bounded-state assertions (and production dashboards) can see it
    "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows": "true",
}


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


def _session_fn(
    gap_s: int, idle_flush_ms: int | None, event_time: bool = False
):
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
                if event_time:
                    # close when the WATERMARK passes last-event + gap:
                    # deterministic event-time semantics (processing-
                    # time flush closes fast replays too early and idle
                    # live streams too late).  Spark rejects a timeout
                    # at-or-below the current watermark, so clamp — the
                    # session is then already closeable and times out
                    # on the next watermark advance.
                    due_ms = cur[1] // 1_000 + gap_s * 1_000
                    state.setTimeoutTimestamp(
                        max(due_ms, state.getCurrentWatermarkMs() + 1)
                    )
                elif idle_flush_ms is not None:
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
    watermark_delay: str | None = None,
) -> DataFrame:
    """Sessionize an event stream with explicit per-user state.

    ``events`` needs columns (user_id, ts timestamp, event_type, value).
    Emits one row per CLOSED session.  Three close mechanisms:

    - a later event of the SAME user beyond ``gap_s`` (always on);
    - ``watermark_delay`` (e.g. ``"10 minutes"``): EVENT-TIME timeout —
      a watermark is applied to ``ts`` and a user's open session closes
      when the watermark passes ``last_event + gap_s``, i.e. exactly
      when no in-order event could still extend it.  This is the
      PRODUCTION mode: deterministic in event time (replays at any
      speed close identically), and it bounds state for one-shot users
      without wall-clock heuristics.  State stays bounded at
      ~|users active within one gap+delay window|.
    - ``idle_flush_ms``: PROCESSING-time silence flush — wall-clock
      heuristic for live dashboards; replay-speed-dependent, and it
      makes the engine run continuous timeout-check batches (leave
      None where ``processAllAvailable`` must quiesce).

    The two timeout modes are mutually exclusive (engine contract:
    one timeoutConf per query).

    At scale pair the event-time mode with the RocksDB state store
    (``ROCKSDB_STATE_CONFS``) so per-executor state lives on local SSD
    instead of heap — exercised together in tests/test_streaming.py.
    """
    if watermark_delay is not None and idle_flush_ms is not None:
        raise ValueError(
            "watermark_delay (event-time timeout) and idle_flush_ms "
            "(processing-time timeout) are mutually exclusive"
        )
    if watermark_delay is not None:
        events = events.withWatermark("ts", watermark_delay)
        timeout = GroupStateTimeout.EventTimeTimeout
    elif idle_flush_ms is not None:
        timeout = GroupStateTimeout.ProcessingTimeTimeout
    else:
        timeout = GroupStateTimeout.NoTimeout
    return (
        events.select("user_id", "ts", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(
                gap_s, idle_flush_ms, event_time=watermark_delay is not None
            ),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
