"""Streaming exact deduplication with bounded state.

The batch engine dedupes with a hash groupBy (operators/dedup.exact_dups)
or a conflict-key anti-join (operators/idempotent). On an unbounded stream
neither works as-is: "have I seen this key" state would grow forever. The
streaming answer is ``dropDuplicatesWithinWatermark`` — exact dedup whose
state Spark expires once the watermark passes an entry, so memory is
bounded by (arrival-rate x watermark horizon), not stream lifetime.

Semantics: a duplicate arriving within the watermark window of its first
occurrence is dropped; one arriving later than the watermark may be
emitted again (state already expired). That trade — bounded state for a
bounded dedup horizon — is the only scalable contract on an infinite
stream; the downstream idempotent sink (foreachBatch anti-join, see
streaming/ingest.py) catches the stragglers at the warehouse boundary.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def streaming_exact_dedup(
    events_stream: DataFrame,
    key_cols: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop duplicate keys within the watermark horizon of their first
    arrival. ``events_stream`` must be a streaming DataFrame with an
    event-time column ``ts_col``."""
    return events_stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
