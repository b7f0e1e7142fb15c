"""Custom stateful streaming: gap-based sessionization with
applyInPandasWithState (EventTimeTimeout).

The batch engine sessionizes with a lag window (contract.q_sessionize,
oracle-checked). Streams cannot lag over unbounded input, so the streaming
twin keeps per-user state — (session_start, last_ts, n_events) — and emits
one row per CLOSED session:

  - events arriving for a user extend the open session while the gap to
    the previous event is <= gap_s, else close it inline and open a new
    one;
  - the OPEN session closes via an event-time timeout at
    last_ts + gap_s: when the stream's watermark passes that point no
    earlier event can reopen it (EventTimeTimeout is data-driven and
    deterministic — wall-clock ProcessingTimeTimeout would tie session
    semantics to scheduler timing). State is bounded by ACTIVE users
    within the watermark horizon, not by history.

Batch/stream parity: once the watermark passes every user's last event +
gap, the closed-session set equals the batch lag-window session set
(tested in tests/test_streaming.py).

This is the `applyInPandasWithState` capability of the north-star toolkit;
it has no reference counterpart (the reference is batch-only).
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("session_start", T.DoubleType()),
    T.StructField("last_ts", T.DoubleType()),
    T.StructField("n_events", T.LongType()),
])

DEFAULT_GAP_S = 1800


def _emit(closed: list[tuple[Any, float, float, int]]):
    # round float-seconds state to whole MICROseconds before building the
    # datetime column: float64 ns residue would otherwise make the ns->us
    # Arrow conversion unsafe (PySparkValueError) on sub-second event times
    yield pd.DataFrame({
        "user_id": [c[0] for c in closed],
        "session_start": pd.to_datetime([round(c[1] * 1e6) for c in closed],
                                        unit="us"),
        "session_end": pd.to_datetime([round(c[2] * 1e6) for c in closed],
                                      unit="us"),
        "n_events": [c[3] for c in closed],
    })


def _session_fn(gap_s: int):
    def fn(key: tuple[Any, ...], pdfs, state: GroupState):
        user_id = key[0]
        if state.hasTimedOut:
            # watermark passed last_ts + gap: no earlier event can extend
            # this session any more -> close and clear
            s0, s1, n = state.get
            state.remove()
            yield from _emit([(user_id, s0, s1, n)])
            return
        ts: list[float] = []
        for pdf in pdfs:
            ts.extend(pdf["ts"].astype("int64").to_numpy() / 1e9)
        ts.sort()
        closed: list[tuple[Any, float, float, int]] = []
        if state.exists:
            s0, s1, n = state.get
        elif ts:
            s0, s1, n = ts[0], ts[0], 0
        else:  # no data and no state: nothing to do
            return
        for t_ in ts:
            if n > 0 and t_ - s1 > gap_s:
                closed.append((user_id, s0, s1, n))
                s0, n = t_, 0
            s1 = max(s1, t_)
            n += 1
        state.update((s0, s1, n))
        # event-time timeout must sit beyond the current watermark;
        # late-arriving state (last_ts+gap already passed) times out at
        # the next watermark tick
        due_ms = int((s1 + gap_s) * 1000)
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(due_ms, wm + 1))
        if closed:
            yield from _emit(closed)

    return fn


def streaming_sessions(
    events: DataFrame, gap_s: int = DEFAULT_GAP_S,
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """events stream (user_id, ts, ...) -> closed-session stream via
    per-user state (applyInPandasWithState, EventTimeTimeout)."""
    return (
        events.select("user_id", "ts")
        .withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_s),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
