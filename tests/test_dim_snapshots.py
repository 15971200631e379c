"""Versioned dim snapshots: file-backed dims (no driver collect), atomic
commit marker, stale/partial snapshot handling."""

from __future__ import annotations

import os

import pytest

from etl_pipeline_last_fm_spark.pipeline import (
    Warehouse,
    _committed_versions,
    _snapshot_dir,
    load_dds,
    run_pipeline,
)
from etl_pipeline_last_fm_spark.sources.lastfm_api import fetch_charts
from etl_pipeline_last_fm_spark.sources.raw_json import write_raw_chart

D1, D2 = "2024-04-01", "2024-04-02"


def _track(name, artist, duration, listeners, rank):
    return {
        "name": name,
        "artist": {"name": artist},
        "duration": str(duration),
        "listeners": str(listeners),
        "@attr": {"rank": str(rank)},
    }


def _fetch(date):
    tracks = [
        _track(f"Song{date}-{i}", f"Artist{i % 2}", 100 + i, 1000, i + 1) for i in range(3)
    ]
    return lambda country: {"tracks": {"track": tracks, "@attr": {"country": country}}}


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("wh_snap"))
    for date in (D1, D2):
        raw = fetch_charts(spark, date, countries=["Testland"], fetch_fn=_fetch(date))
        write_raw_chart(raw, Warehouse(root).raw)
        run_pipeline(spark, root, date)
    return Warehouse(root)


def test_dims_are_file_backed_not_driver_materialized(spark, warehouse):
    """The scale guarantee: loading dims must not require driver
    materialization — the physical plan is a parquet scan, not a
    LocalTableScan over collect()ed rows."""
    dds = load_dds(spark, warehouse)
    for df in (dds.dim_country, dds.dim_artist, dds.dim_song):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "FileScan parquet" in plan, plan
        assert "LocalTableScan" not in plan, plan


def test_snapshot_per_run_latest_committed_wins(spark, warehouse):
    versions = _committed_versions(spark, warehouse)
    assert len(versions) >= 2  # one per pipeline run
    # Day-2 songs only exist in the latest snapshot.
    songs = {r.song_name for r in load_dds(spark, warehouse).dim_song.collect()}
    assert any(D2 in s for s in songs) and any(D1 in s for s in songs)


def test_uncommitted_snapshot_is_invisible(spark, warehouse):
    stale = _snapshot_dir(warehouse, 999999)
    os.makedirs(os.path.join(stale, "dim_country"), exist_ok=True)
    try:
        versions = _committed_versions(spark, warehouse)
        assert 999999 not in versions
        assert load_dds(spark, warehouse) is not None
    finally:
        import shutil

        shutil.rmtree(stale, ignore_errors=True)


def test_partial_committed_snapshot_raises_descriptive_error(spark, tmp_path):
    """A committed marker with a missing dim (external damage) must fail
    loudly, naming the missing table (ADVICE r1)."""
    wh = Warehouse(str(tmp_path / "wh_broken"))
    snap = _snapshot_dir(wh, 1)
    os.makedirs(snap, exist_ok=True)
    with open(os.path.join(snap, "_COMMITTED"), "w") as f:
        f.write("x")
    with pytest.raises(RuntimeError, match="dim_country"):
        load_dds(spark, wh)


def test_fact_date_slice_is_partition_pruned(spark, warehouse):
    """Pipeline-module plan invariant (round 11, extending the r10 lesson
    that registry plan tests never covered this module): run_dm's daily
    fact slice must reach the parquet scan as a PARTITION filter — the
    fact is written partitionBy(date), so the scan of a 100 TB history
    must list one date directory, not filter post-read."""
    from pyspark.sql import functions as F

    dds = load_dds(spark, warehouse)
    day = dds.fact.filter(F.col("date") == F.lit(D2))
    plan = day._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "PartitionFilters" in scan, plan
    import re

    pf = re.search(r"PartitionFilters: \[(.*?)\]", scan).group(1)
    assert "date" in pf and "2024-04-02" in pf, scan
