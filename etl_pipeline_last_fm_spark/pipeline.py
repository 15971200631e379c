"""The end-to-end daily batch pipeline: RAW -> ODS -> DDS -> DM.

Collapses the reference's four Airflow DAGs + sensors + XCom plumbing
(SURVEY.md §3) into one parameterized job, ``run_pipeline(spark, warehouse,
run_date)``. Sequential function calls replace ExternalTaskSensor barriers;
DataFrames replace the staging table and the XCom'd CSV path; the single
``run_date`` parameter replaces the Airflow ``data_interval_end`` that the
reference threads through every statement (Appendix A.8).

Storage layout (all parquet, all partitioned so daily runs touch one
partition):

    <warehouse>/raw/ingest_date=<d>/country=<c>/*.json
    <warehouse>/ods_daily_data/source_date=<d>/...
    <warehouse>/dds/dim_snapshots/v=NNNNNN/dim_{artist,country,song}/
                                           + _COMMITTED   (atomic snapshot)
    <warehouse>/dds/fact_daily_top_100/date=<d>/...
    <warehouse>/dm/<mart>/date=<d>/...

Idempotence: ODS + DDS appends go through ``idempotent_append`` (the
ON CONFLICT emulation, §2.7); DM marts are overwritten per date partition —
a deliberate fix of the reference's non-idempotent marts (Appendix A.4).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from datetime import date as Date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_last_fm_spark.operators.flatten import flatten_raw_chart
from etl_pipeline_last_fm_spark.operators.idempotent import idempotent_append
from etl_pipeline_last_fm_spark.plans.marts import (
    mart_artist_appearances,
    mart_avg_duration_by_country,
    mart_expected_royalties,
)
from etl_pipeline_last_fm_spark.plans.star_build import DdsTables, build_dds
from etl_pipeline_last_fm_spark.schemas import (
    FACT_SCHEMA,
    ODS_CONFLICT_KEY,
    ODS_SCHEMA,
)
from etl_pipeline_last_fm_spark.sources.raw_json import read_raw_chart


@dataclass
class Warehouse:
    root: str

    @property
    def raw(self) -> str:
        return os.path.join(self.root, "raw")

    @property
    def ods(self) -> str:
        return os.path.join(self.root, "ods_daily_data")

    def dds(self, name: str) -> str:
        return os.path.join(self.root, "dds", name)

    def dm(self, name: str) -> str:
        return os.path.join(self.root, "dm", name)


def _read_or_empty(spark: SparkSession, path: str, schema) -> DataFrame | None:
    if os.path.exists(path) and any(
        f.endswith(".parquet") for _, _, fs in os.walk(path) for f in fs
    ):
        return spark.read.parquet(path)
    return None


def run_ods(spark: SparkSession, wh: Warehouse, run_date: str | Date) -> None:
    """RAW json -> flatten -> idempotent append into the ODS table.

    Spark equivalent of DAG ``transformed_from_s3_to_pg`` (SURVEY.md §3
    entry point 2): the S3 LIST, CSV detour, TRUNCATE+COPY staging and
    ON CONFLICT insert all collapse into one declarative chain.
    """
    raw = read_raw_chart(spark, wh.raw, ingest_date=run_date)
    ods_batch = flatten_raw_chart(raw)
    existing = _read_or_empty(spark, wh.ods, ODS_SCHEMA)
    delta = idempotent_append(
        ods_batch,
        existing,
        keys=ODS_CONFLICT_KEY,  # UNIQUE(song_rank, source_date, country), ddl_ods.sql:23
        tiebreaker=["song_name", "artist_name"],
        prune_on=["source_date"],
    )
    (
        delta.repartition("source_date")
        .write.mode("append")
        .partitionBy("source_date")
        .parquet(wh.ods)
    )


_DIM_NAMES = ("dim_country", "dim_artist", "dim_song")
_COMMIT_MARKER = "_COMMITTED"


def _snapshot_root(wh: Warehouse) -> str:
    return wh.dds("dim_snapshots")


def _committed_versions(wh: Warehouse) -> list[int]:
    root = _snapshot_root(wh)
    if not os.path.isdir(root):
        return []
    out = []
    for d in os.listdir(root):
        if d.startswith("v=") and os.path.exists(os.path.join(root, d, _COMMIT_MARKER)):
            out.append(int(d[2:]))
    return sorted(out)


def _snapshot_dir(wh: Warehouse, version: int) -> str:
    return os.path.join(_snapshot_root(wh), f"v={version:06d}")


def run_dds(
    spark: SparkSession, wh: Warehouse, run_date: str | Date, keep_snapshots: int = 2
) -> None:
    """ODS date slice -> star build -> append fact delta, write a NEW dim
    snapshot version and atomically commit it.

    Dims are never overwritten in place and never collect()ed to the driver:
    each run writes all three to a fresh ``dim_snapshots/v=N+1/`` directory
    (the plans read v=N — different paths, so no stale-file-index conflict)
    and drops a ``_COMMITTED`` marker only after all three writes succeed.
    Readers resolve the latest *committed* version, and the fact delta is
    appended only AFTER the commit, so a crash anywhere leaves the star
    self-consistent: either the old snapshot is live, or the new one is
    live with the day's fact rows at worst absent (re-run appends them —
    the delta is an anti-join against the existing fact). The
    snapshot-pointer pattern (Iceberg-style) instead of the reference's
    in-place UPSERTs. Note the version/commit-marker bookkeeping uses
    driver-local filesystem ops (os/open/shutil); on an object store it
    needs the Hadoop FileSystem API instead — see ``s3a_conf``. This stays O(executor) however large dim_song grows
    (it is ~distinct(song, duration) and scales with the corpus, unlike the
    genuinely bounded country dim)."""
    # _read_or_empty: a day-one run whose ingest landed zero rows leaves the
    # ODS path without parquet files — build against an empty ODS rather
    # than failing schema inference.
    ods_all = _read_or_empty(spark, wh.ods, ODS_SCHEMA)
    if ods_all is None:
        ods_all = spark.createDataFrame([], ODS_SCHEMA)
    ods = ods_all.filter(F.col("source_date") == F.lit(str(run_date)))
    existing = load_dds(spark, wh)
    result = build_dds(ods, existing=existing)

    # Dim snapshot FIRST, fact delta second: a crash between the two leaves
    # committed dims whose fact rows for the day are simply absent — the
    # re-run recomputes the same delta (anti-join vs existing fact) and
    # appends it. The reverse order would leave live fact rows referencing
    # surrogate ids that exist only in an uncommitted snapshot, silently
    # dropped by every star join until the day is re-run.
    versions = _committed_versions(wh)
    new_v = (versions[-1] + 1) if versions else 1
    snap = _snapshot_dir(wh, new_v)
    for name, full in [
        ("dim_country", result.dim_country),
        ("dim_artist", result.dim_artist),
        ("dim_song", result.dim_song),
    ]:
        # coalesce(1): one broadcast-friendly file per dim per snapshot.
        full.coalesce(1).write.mode("overwrite").parquet(os.path.join(snap, name))
    with open(os.path.join(snap, _COMMIT_MARKER), "w") as f:
        f.write(str(run_date))

    fact_path = wh.dds("fact_daily_top_100")
    (
        result.new_fact.repartition("date")
        .write.mode("append")
        .partitionBy("date")
        .parquet(fact_path)
    )

    # Retire old snapshots (keep a short history for readers mid-flight).
    import shutil

    for v in versions[:-keep_snapshots] if keep_snapshots else versions:
        shutil.rmtree(_snapshot_dir(wh, v), ignore_errors=True)


def load_dds(spark: SparkSession, wh: Warehouse) -> DdsTables | None:
    """Load the DDS star, file-backed end to end (no driver materialization):
    dims come from the latest *committed* snapshot directory, the fact from
    its partitioned path. Returns None when no snapshot exists yet; raises
    if the warehouse is inconsistent (a committed snapshot missing a dim, or
    dims without a fact) rather than failing later with a cryptic error."""
    versions = _committed_versions(wh)
    if not versions:
        return None
    snap = _snapshot_dir(wh, versions[-1])

    dims: dict[str, DataFrame | None] = {
        name: _read_or_empty(spark, os.path.join(snap, name), None) for name in _DIM_NAMES
    }
    missing = [n for n, df in dims.items() if df is None]
    if missing:
        raise RuntimeError(
            f"DDS warehouse at {wh.root} is inconsistent: snapshot v={versions[-1]} "
            f"is committed but {', '.join(missing)} is missing — "
            "a partial prior run or external deletion; re-run run_dds or remove the snapshot."
        )
    # An absent fact path is NOT inconsistency: an empty first run writes
    # dims (one empty part file each) but `.partitionBy` of an empty fact
    # delta emits no parquet at all, and a crash between snapshot commit
    # and fact append (the tolerated window, see run_dds) looks the same.
    # Treat it as an empty fact and let the next delta fill it — but WARN
    # when the committed dims are non-empty: dims only gain members from
    # days that produced fact rows, so populated dims + no fact path means
    # external deletion far likelier than a string of empty days, and a
    # silent empty fact would let the next mart run overwrite real data
    # with nothing. (Keyed on dim content, not snapshot count — snapshot
    # retention (keep_snapshots) can legitimately be 1.)
    fact = _read_or_empty(spark, wh.dds("fact_daily_top_100"), FACT_SCHEMA)
    if fact is None:
        if dims["dim_country"].limit(1).count() > 0:
            import logging

            logging.getLogger(__name__).warning(
                "DDS at %s: committed dim snapshot v=%d is populated but no "
                "fact files exist at %s — external deletion is likelier than "
                "empty-day history; verify before the next mart run.",
                wh.root,
                versions[-1],
                wh.dds("fact_daily_top_100"),
            )
        fact = spark.createDataFrame([], FACT_SCHEMA)
    return DdsTables(
        dim_country=dims["dim_country"],
        dim_artist=dims["dim_artist"],
        dim_song=dims["dim_song"],
        fact=fact,
    )


def run_dm(spark: SparkSession, wh: Warehouse, run_date: str | Date) -> None:
    """DDS date slice -> 3 marts, overwritten per date partition (idempotent;
    deliberate fix of the reference's duplicate-on-rerun marts, Appendix A.4).
    """
    dds = load_dds(spark, wh)
    if dds is None:
        raise RuntimeError("DDS layer empty — run run_dds first")
    fact_day = dds.fact.filter(F.col("date") == F.lit(str(run_date)))

    marts = {
        "avg_song_duration_by_country": mart_avg_duration_by_country(
            fact_day, dds.dim_song, dds.dim_country
        ),
        "artist_appearances_by_date": mart_artist_appearances(fact_day, dds.dim_artist),
        "expected_artist_royalties_by_date": mart_expected_royalties(fact_day, dds.dim_artist),
    }
    for name, df in marts.items():
        (
            df.coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("date")
            .parquet(wh.dm(name))
        )


def run_pipeline(spark: SparkSession, warehouse_root: str, run_date: str | Date) -> Warehouse:
    """Full daily run (entry points 2+3 of SURVEY.md §3). The raw zone must
    already contain ``ingest_date=<run_date>`` (entry point 1: see
    sources.lastfm_api / streaming.ingest)."""
    wh = Warehouse(warehouse_root)
    run_ods(spark, wh, run_date)
    run_dds(spark, wh, run_date)
    run_dm(spark, wh, run_date)
    return wh
