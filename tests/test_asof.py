"""asof_join / time_range_join semantics on hand-built frames, plus an
equivalence check of the bucketed range join against the naive theta-join."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from etl_pipeline_last_fm_spark.functions.scalar import ts_us
from etl_pipeline_last_fm_spark.operators.asof import asof_join, time_range_join


def _ts(s: float):
    return datetime.utcfromtimestamp(s)


def _left(spark):
    return spark.createDataFrame(
        [(1, 10, _ts(100.0)), (2, 10, _ts(200.0)), (3, 10, _ts(50.0)), (4, 20, _ts(100.0))],
        "event_id long, user_id long, ts timestamp",
    )


def _right(spark):
    return spark.createDataFrame(
        [(10, _ts(100.0), 1.0), (10, _ts(150.0), 2.0), (30, _ts(10.0), 9.0)],
        "user_id long, ts timestamp, rv double",
    )


def test_asof_backward_inclusive(spark):
    out = {
        r["event_id"]: (r["matched_rv"], r["matched_ts_us"])
        for r in asof_join(
            _left(spark), _right(spark), key_col="user_id", right_value_cols=["rv"]
        ).collect()
    }
    assert out[1] == (1.0, 100_000_000)  # exact ts tie matches (inclusive)
    assert out[2] == (2.0, 150_000_000)  # greatest right ts <= left ts
    assert out[3] == (None, None)  # nothing earlier
    assert out[4] == (None, None)  # no right rows for key at all


def test_asof_tolerance(spark):
    out = {
        r["event_id"]: r["matched_rv"]
        for r in asof_join(
            _left(spark),
            _right(spark),
            key_col="user_id",
            right_value_cols=["rv"],
            tolerance_us=40_000_000,
        ).collect()
    }
    assert out[1] == 1.0  # gap 0 <= tol
    assert out[2] is None  # gap 50s > 40s tolerance -> nulled
    assert out[3] is None


def test_asof_keeps_all_left_rows(spark):
    out = asof_join(_left(spark), _right(spark), key_col="user_id", right_value_cols=["rv"])
    assert out.count() == 4
    assert set(out.columns) == {"event_id", "user_id", "ts", "matched_rv", "matched_ts_us"}


def test_range_join_matches_naive_theta_join(spark, sf_dir):
    """The bucketed plan must produce exactly the naive inequality-join pairs
    (each exactly once) on real fixture data."""
    from etl_pipeline_last_fm_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "ts")
    a = ev.filter(F.col("event_type") == "click")
    b = ev.filter(F.col("event_type") == "view")
    gap = 300_000_000
    fast = time_range_join(a, b, key_col="user_id", max_gap_us=gap)

    au = a.select(F.col("user_id").alias("k"), F.col("event_id").alias("a_id"),
                  ts_us("ts").alias("a_us"))
    bu = b.select(F.col("user_id").alias("k"), F.col("event_id").alias("b_id"),
                  ts_us("ts").alias("b_us"))
    naive = (
        au.join(bu, "k")
        .filter((F.col("b_us") - F.col("a_us") >= 0) & (F.col("b_us") - F.col("a_us") <= gap))
        .select("a_id", "b_id")
    )
    fast_pairs = {(r["a_id"], r["b_id"]) for r in fast.collect()}
    naive_pairs = {(r["a_id"], r["b_id"]) for r in naive.collect()}
    assert fast_pairs == naive_pairs
    assert fast.count() == len(fast_pairs)  # no duplicate pair emission


def test_range_join_boundary_exact_gap(spark):
    """A pair exactly max_gap apart straddles a bucket boundary — the +1
    probe must catch it; a pair one µs past must not appear."""
    a = spark.createDataFrame([(1, 5, _ts(0.0))], "event_id long, user_id long, ts timestamp")
    b = spark.createDataFrame(
        [(2, 5, _ts(60.0)), (3, 5, _ts(60.000001))],
        "event_id long, user_id long, ts timestamp",
    )
    out = time_range_join(a, b, key_col="user_id", max_gap_us=60_000_000).collect()
    assert {(r["a_id"], r["b_id"], r["gap_us"]) for r in out} == {(1, 2, 60_000_000)}
