"""Structured Streaming variants of the ingest path (SURVEY.md §2.11, §7.6)."""

from etl_pipeline_last_fm_spark.streaming.ingest import (
    stream_raw_to_ods,
    windowed_event_stats,
)

__all__ = ["stream_raw_to_ods", "windowed_event_stats"]
