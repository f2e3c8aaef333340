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
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Persist `df` and register it for the next `release_caches()`."""
    _TRACKED.append(df.persist())
    return df


def release_caches() -> int:
    """Unpersist every tracked frame; returns how many were released."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n
