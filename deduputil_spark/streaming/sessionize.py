"""Stateful streaming sessionization (applyInPandasWithState).

The batch gap-rule sessionization (__spark_entry__.q_sessionize) re-realized
as a custom stateful streaming operator: per user, an open session
(start, last_ts, n_events) lives in the state store; an event with
gap > `gap_s` closes the previous session and opens a new one, and an
event-time timeout (watermark-driven) closes sessions that stop receiving
events.  Closed sessions are APPENDED downstream — the streaming analog of
the reference's batch-only world (the reference has no streaming constructs,
SURVEY.md §2.5), built the Spark-native way: watermark + per-key state, no
driver involvement, state bounded by the timeout.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SESSION_SCHEMA = "user_id string, session_start timestamp, session_end timestamp, n_events bigint"
_STATE_SCHEMA = "start bigint, last bigint, n bigint"  # epoch microseconds

_US = 1_000_000


def _make_fn(gap_s: int):
    gap_us = gap_s * _US

    def fn(key, pdfs, state):
        user_id = key[0]

        def emit(rows):
            return pd.DataFrame(
                {
                    "user_id": [user_id] * len(rows),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in rows],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in rows],
                    "n_events": [n for _, _, n in rows],
                }
            )

        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield emit([(start, last, n)])
            return
        ts = (
            pd.concat([p["ts"] for p in pdfs])
            .sort_values()
            .astype("int64")
            .floordiv(1000)  # ns -> us
            .tolist()
        )
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        closed = []
        for t in ts:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_us:
                closed.append((start, last, n))
                start, last, n = t, t, 1
            else:
                last = max(last, t)
                n += 1
        state.update((start, last, n))
        # close the open session when no event arrives for gap_s past the
        # watermark (timeout is in epoch MILLIseconds)
        state.setTimeoutTimestamp(last // 1000 + gap_s * 1000)
        if closed:
            yield emit(closed)

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_s: int = 1800,
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """events stream (user_id, ts, …) -> closed sessions
    (user_id, session_start, session_end, n_events), append mode.

    State is one small tuple per ACTIVE user — bounded by the event-time
    timeout, never by history — so the operator survives any corpus size;
    skew-safety comes from the groupBy hash exchange like every other key."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    prepared = events.select(
        F.col(key_col).alias("user_id"), F.col(ts_col).alias("ts")
    ).withWatermark("ts", watermark)
    return prepared.groupBy("user_id").applyInPandasWithState(
        _make_fn(gap_s),
        SESSION_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
