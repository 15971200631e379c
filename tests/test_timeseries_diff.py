"""Planted-truth tests for gapfill_daily, snapshot_diff and
token_budget_sample (oracle parity is covered separately on the fixture
corpus; these pin semantics on hand-built inputs)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from etl_pipeline_last_fm_spark.operators.sampling import token_budget_sample
from etl_pipeline_last_fm_spark.operators.scd import snapshot_diff
from etl_pipeline_last_fm_spark.operators.timeseries import gapfill_daily


def test_gapfill_zero_and_locf(spark):
    d = datetime.date
    obs = spark.createDataFrame(
        [
            (1, d(2024, 1, 1), 3, 10.0),
            (1, d(2024, 1, 4), 1, 40.0),  # gap: Jan 2-3 missing
            (2, d(2024, 1, 2), 2, 5.0),   # single day -> no gap
        ],
        ["k", "day", "n", "level"],
    )
    out = {
        (r.k, r.day.isoformat()): r
        for r in gapfill_daily(
            obs, "k", "day", zero_cols=["n"], locf_cols=["level"]
        ).collect()
    }
    assert len(out) == 5  # 4 days for key 1, 1 day for key 2
    gap = out[(1, "2024-01-02")]
    assert (gap.n, gap.level, gap.was_observed) == (0, 10.0, False)
    gap3 = out[(1, "2024-01-03")]
    assert (gap3.n, gap3.level, gap3.was_observed) == (0, 10.0, False)
    end = out[(1, "2024-01-04")]
    assert (end.n, end.level, end.was_observed) == (1, 40.0, True)
    assert out[(2, "2024-01-02")].was_observed


def test_snapshot_diff_classes(spark):
    old = spark.createDataFrame(
        [(1, "A", 10.0), (2, "B", 20.0), (3, "C", 30.0), (4, None, 40.0)],
        ["k", "status", "price"],
    )
    new = spark.createDataFrame(
        [(2, "B", 20.0), (3, "C", 31.0), (4, "D", 40.0), (5, "E", 50.0)],
        ["k", "status", "price"],
    )
    rows = {
        r.k: r for r in snapshot_diff(old, new, ["k"], ["status", "price"]).collect()
    }
    assert rows[1].change == "removed"
    assert 2 not in rows  # unchanged rows are omitted
    assert rows[3].change == "changed" and rows[3].old_price == 30.0 and rows[3].new_price == 31.0
    assert rows[4].change == "changed"  # NULL -> 'D' is a change (null-safe)
    assert rows[5].change == "added" and rows[5].old_status is None


def test_token_budget_sample_prefix_and_budgets(spark):
    rows = [(i, "web" if i < 20 else "code", "tok " * 10) for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    # Each doc has 10 non-empty tokens (trailing space trimmed) -> budget
    # 35 keeps docs while cum_before < 35: prefixes of 4 docs (0,10,20,30).
    out = token_budget_sample(df, {"web": 35}, "source", "doc_id", "text")
    got = out.collect()
    assert all(r.source == "web" for r in got)  # 'code' has no budget
    assert len(got) == 4
    assert sorted(r.cum_before for r in got) == [0, 10, 20, 30]
    # Deterministic: same result on re-evaluation.
    assert sorted(r.doc_id for r in got) == sorted(
        r.doc_id for r in token_budget_sample(df, {"web": 35}, "source", "doc_id", "text").collect()
    )
