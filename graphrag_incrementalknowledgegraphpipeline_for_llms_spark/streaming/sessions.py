"""Custom stateful streaming operator: event-time sessionization via
``applyInPandasWithState``.

The batch twin lives in ``operators.events.sessionize``; this is the
Structured-Streaming version for unbounded event streams: per-key
session state (current session start/end/count) is kept in the state
store, sessions are EMITTED when closed — either by an event arriving
after the gap, or by processing-time timeout for keys that went quiet.

Scale shape: state is O(active keys), one shuffle per microbatch on
the key (the standard streaming-sessionization topology); Arrow
batches bound per-group transfer.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def make_session_fn(gap_seconds: int = 1800, timeout_ms: int = 30_000):
    """Build the (key, pdf_iter, state) -> pdf_iter function for
    ``applyInPandasWithState``; separated for direct unit testing with
    a fake GroupState."""
    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                }
            )
            return
        ts_list: list[int] = []
        for pdf in pdfs:
            ts_list.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
        ts_list.sort()
        cur = list(state.get) if state.exists else None
        closed: list[tuple[int, int, int]] = []
        for t in ts_list:
            if cur is None:
                cur = [t, t, 0]
            elif t - cur[1] > gap_us:
                closed.append(tuple(cur))
                cur = [t, t, 0]
            cur[1] = max(cur[1], t)
            cur[2] += 1
        if cur is not None:
            state.update(tuple(cur))
            state.setTimeoutDuration(timeout_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return fn


def stream_sessions(
    events: DataFrame,
    gap_seconds: int = 1800,
    timeout_ms: int = 30_000,
) -> DataFrame:
    """Apply stateful sessionization to a STREAMING events DataFrame
    with columns (user_id, ts, ...).  Returns the stream of CLOSED
    sessions; open sessions flush on timeout once their key goes
    quiet."""
    return events.groupBy("user_id").applyInPandasWithState(
        make_session_fn(gap_seconds, timeout_ms),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
