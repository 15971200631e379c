"""Round-6 operator tests: MATCH_RECOGNIZE per-match MEASURES."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F


def _events(spark, seq: dict[int, list[str]]):
    rows = []
    eid = 0
    for uid, events in seq.items():
        for i, et in enumerate(events):
            rows.append((eid, uid, et, datetime(2024, 1, 1, 0, i, 0), 1.0))
            eid += 1
    return spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, "
        "ts timestamp, value double",
    )


def test_measures_positions_on_crafted_stream(spark):
    """Hand-checked positions: user 1 = vcvcp — one match "vcp" over
    events 2..4 (leftmost attempt at 0 dies: c* needs CONSECUTIVE
    clicks); user 2 = vpvp — matches at events 5..6 and 7..8, including
    a match ending at string end; user 3 = pvc — no match, NO rows."""
    from etl_pipeline_last_fm_spark.operators.patterns import (
        match_event_pattern_measures,
    )

    ev = _events(
        spark,
        {
            1: ["view", "click", "view", "click", "purchase"],
            2: ["view", "purchase", "view", "purchase"],
            3: ["purchase", "view", "click"],
        },
    )
    got = sorted(
        (
            r["user_id"],
            r["match_no"],
            r["match_str"],
            r["start_event_id"],
            r["end_event_id"],
        )
        for r in match_event_pattern_measures(ev, "vc*p").collect()
    )
    assert got == [
        (1, 1, "vcp", 2, 4),
        (2, 1, "vp", 5, 6),
        (2, 2, "vp", 7, 8),
    ]


def test_measures_match_at_string_start_and_adjacent_matches(spark):
    """A match at position 1 (empty leading gap) and back-to-back
    matches (empty inter-match gaps) keep the prefix-sum arithmetic
    honest — split() yields empty segments there on both engines."""
    from etl_pipeline_last_fm_spark.operators.patterns import (
        match_event_pattern_measures,
    )

    ev = _events(spark, {7: ["view", "purchase", "view", "purchase"]})
    got = sorted(
        (r["match_no"], r["start_event_id"], r["end_event_id"])
        for r in match_event_pattern_measures(ev, "vp").collect()
    )
    assert got == [(1, 0, 1), (2, 2, 3)]


def test_measures_timestamps_come_from_boundary_events(spark):
    """start_us/end_us are the epoch-µs of the first/last event OF THE
    MATCH, not of the user's stream."""
    from etl_pipeline_last_fm_spark.operators.patterns import (
        match_event_pattern_measures,
    )

    ev = _events(spark, {1: ["error", "view", "click", "purchase", "error"]})
    [r] = match_event_pattern_measures(ev, "vc*p").collect()
    base = int(datetime(2024, 1, 1).timestamp() * 1_000_000)
    assert r["start_us"] == base + 1 * 60 * 1_000_000
    assert r["end_us"] == base + 3 * 60 * 1_000_000


def test_measures_rejects_zero_width_pattern(spark):
    from etl_pipeline_last_fm_spark.operators.patterns import (
        match_event_pattern_measures,
    )

    ev = _events(spark, {1: ["view"]})
    with pytest.raises(ValueError, match="empty string"):
        match_event_pattern_measures(ev, "c*")


def test_measures_consistent_with_summary_counts(spark, sf_dir):
    """Per-match rows aggregate back to the summary operator's
    n_matches on the real fixture (users with 0 matches absent here,
    present there)."""
    from etl_pipeline_last_fm_spark.operators.patterns import (
        match_event_pattern,
        match_event_pattern_measures,
    )
    from etl_pipeline_last_fm_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    summary = {
        r["user_id"]: r["n_matches"]
        for r in match_event_pattern(ev, "vc*p").collect()
    }
    per_match = {
        r["user_id"]: r["n"]
        for r in match_event_pattern_measures(ev, "vc*p")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert per_match == {u: n for u, n in summary.items() if n > 0}
    # MEASURES rows are per match: match_no is dense 1..n per user.
    mx = {
        r["user_id"]: r["mx"]
        for r in match_event_pattern_measures(ev, "vc*p")
        .groupBy("user_id")
        .agg(F.max("match_no").alias("mx"))
        .collect()
    }
    assert mx == per_match
