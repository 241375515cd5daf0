"""Custom stateful streaming operator: session aggregation via
applyInPandasWithState — the arbitrary-state API for operators that
windowed aggregation can't express (the task brief's 'custom stateful
operators' slot; batch twin: plans/scalepath.py::sessionize_events).

State per user: (session_start, last_event, n_events). An incoming event
more than GAP seconds after the last one closes the running session (the
closed session is emitted) and starts a new one. Out-of-order events within
the gap are absorbed with clamped boundaries (start=min, end=max — a late
event never moves a boundary backwards); idle sessions are flushed by an
event-time timeout once the watermark passes last_event + GAP.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

GAP_SEC = 1800

SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", LongType()),
        StructField("session_end", LongType()),
        StructField("n_events", LongType()),
    ]
)

SESSION_STATE = StructType(
    [
        StructField("start", LongType()),
        StructField("last", LongType()),
        StructField("n", LongType()),
    ]
)


def _sessionize(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    (user_id,) = key

    # Event-time timeout fired with no new data: the idle session closes.
    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame(
            [(user_id, start, last, n)],
            columns=["user_id", "session_start", "session_end", "n_events"],
        )
        return

    if state.exists:
        start, last, n = state.get
    else:
        start = last = None
        n = 0

    closed = []
    for pdf in pdfs:
        for es in sorted(int(x) for x in pdf["es"]):
            if last is None:
                start, last, n = es, es, 1
            elif es - last > GAP_SEC:
                closed.append((user_id, start, last, n))
                start, last, n = es, es, 1
            else:
                # Clamped updates: a late (out-of-order across micro-batches)
                # event must never move the session boundary backwards, and an
                # early straggler extends the start instead of being dropped.
                last = max(last, es)
                start = min(start, es)
                n += 1
    state.update((start, last, n))
    # Close the session once event time passes last + GAP (watermark-driven).
    state.setTimeoutTimestamp((last + GAP_SEC) * 1000)
    if closed:
        yield pd.DataFrame(closed, columns=["user_id", "session_start",
                                            "session_end", "n_events"])


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events stream → closed sessions (user_id, start, end, n_events)."""
    import pyspark.sql.functions as F

    prepared = events.select(
        "user_id",
        F.col("ts").cast("timestamp").alias("event_time"),
        F.unix_timestamp(F.col("ts").cast("timestamp")).alias("es"),
    ).withWatermark("event_time", f"{GAP_SEC} seconds")
    return prepared.groupBy("user_id").applyInPandasWithState(
        _sessionize,
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
