"""Stateful streaming sessionization via applyInPandasWithState.

The custom-stateful-operator pattern (SURVEY.md §2.11): per-user session
state lives in the state store, survives micro-batch boundaries (and, via
the checkpoint, restarts). Each batch folds its events into the open
session, emits sessions as they close, and re-emits the open session's
current snapshot (update semantics — downstream consumers take the latest
row per (user_id, session_start), exactly like the idempotent-append
consumers elsewhere in this engine).

Gap arithmetic matches operators.sessions.sessionize (integer microseconds),
so for in-order streams the end-of-stream output equals the batch result.

Late-data semantics (cross-batch out-of-order events): a late event folds
into the currently-open session with max/min guards — it can extend
``session_start`` earlier but never moves ``session_end`` backwards, and it
never re-opens a session already emitted as closed (that would require
retraction; re-run the batch ``sessionize`` for full-ordering authority).
State lives under ``GroupStateTimeout.NoTimeout`` — bounded by the number of
ACTIVE users, the right trade for a dedup/sessionization stream; wire a
ProcessingTimeTimeout + state.remove() where the key space is unbounded.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, session_value double, closed boolean"
)
STATE_SCHEMA = "start long, last long, n long, total double"


def _fold(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_us: int,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        start, last, n, total = state.get
    else:
        start = last = None
        n, total = 0, 0.0

    out: list[tuple[Any, ...]] = []
    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    for ts, value in zip(rows["ts"], rows["value"]):
        us = int(pd.Timestamp(ts).value // 1000)
        if last is not None and us - last > gap_us:
            out.append((user_id, start, last, n, total, True))
            start, n, total = us, 0, 0.0
        if start is None:
            start = us
        else:
            # Cross-batch late arrival (us < last is possible only across
            # micro-batches — in-batch rows are sorted): merge it into the
            # OPEN session instead of moving its end backwards. It may
            # extend the session start earlier; it never reopens an
            # already-emitted closed session (that would need retraction —
            # the batch sessionize twin is the full-ordering authority).
            start = min(start, us)
        last = us if last is None else max(last, us)
        n += 1
        total += float(value)

    state.update((start, last, n, total))
    # Snapshot of the open session (update semantics).
    out.append((user_id, start, last, n, total, False))
    yield pd.DataFrame(
        {
            "user_id": [r[0] for r in out],
            "session_start": [pd.Timestamp(r[1] * 1000) for r in out],
            "session_end": [pd.Timestamp(r[2] * 1000) for r in out],
            "n_events": [r[3] for r in out],
            "session_value": [round(r[4], 2) for r in out],
            "closed": [r[5] for r in out],
        }
    )


def streaming_sessionize(events_stream: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """events stream (user_id, ts, event_id, value, ...) -> session updates."""
    gap_us = gap_minutes * 60_000_000

    def fold(key, pdfs, state):
        return _fold(key, pdfs, state, gap_us)

    return (
        events_stream.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
