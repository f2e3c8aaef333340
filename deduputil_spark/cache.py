"""Scoped cache lifecycle for operator-internal persists.

Some operators persist an intermediate that feeds several branches of the
SAME returned plan (e.g. the verify k-gram sets feeding both join sides).
The operator cannot unpersist it — the caller has not materialized the result
yet — so it registers the frame here and the *caller* releases after its
action completes (`bench.py` between queries, the driver-contract wrappers in
`__spark_entry__.py`, long-lived sessions whenever convenient).

Unreleased entries are harmless in a short job (executor storage is reclaimed
at shutdown) but accumulate across a many-query session; `release_caches()`
bounds that to the live query's working set.

Tracking is keyed per SparkSession and guarded by a lock (ADVICE r3): a
threaded driver releasing one session's working set can neither race the list
mutation nor unpersist frames a concurrently-building query in ANOTHER session
still relies on.  (Within one session, callers serialize release against their
own in-flight builds — the same contract as before.)
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession

_LOCK = threading.Lock()
_TRACKED: dict[int, list[DataFrame]] = {}  # id(SparkSession) -> persisted frames


def track(df: DataFrame) -> DataFrame:
    """Persist `df` and register it for the next `release_caches()`."""
    df.persist()
    with _LOCK:
        _TRACKED.setdefault(id(df.sparkSession), []).append(df)
    return df


def release_caches(session: SparkSession | None = None) -> int:
    """Unpersist tracked frames; returns how many were released.

    With `session`, only that session's frames are released; default releases
    everything (the single-session common case)."""
    with _LOCK:
        if session is None:
            frames = [f for lst in _TRACKED.values() for f in lst]
            _TRACKED.clear()
        else:
            frames = _TRACKED.pop(id(session), [])
    n = 0
    for df in reversed(frames):
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n
