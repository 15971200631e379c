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
    <warehouse>/dds/dim_{artist,country,song}/          (small, unpartitioned)
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
    DIM_ARTIST_SCHEMA,
    DIM_COUNTRY_SCHEMA,
    DIM_SONG_SCHEMA,
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


def run_dds(spark: SparkSession, wh: Warehouse, run_date: str | Date) -> None:
    """ODS date slice -> star build -> append fact delta, overwrite dims
    (dims before fact in the reference, dags/from_ods_to_dds_pg.py:110; here
    the fact *write* happens first because the dim overwrite replaces files —
    the dims returned by load_dds are driver-materialized, so no plan still
    depends on the replaced paths)."""
    ods = spark.read.parquet(wh.ods).filter(F.col("source_date") == F.lit(str(run_date)))
    existing = load_dds(spark, wh)
    result = build_dds(ods, existing=existing)

    # Fact delta first (append — touches no existing file).
    fact_path = wh.dds("fact_daily_top_100")
    (
        result.new_fact.repartition("date")
        .write.mode("append")
        .partitionBy("date")
        .parquet(fact_path)
    )

    # Dims: tiny (SURVEY.md §2.4) — materialize on the driver, then overwrite
    # as a single broadcast-friendly file each.
    for name, full in [
        ("dim_country", result.dim_country),
        ("dim_artist", result.dim_artist),
        ("dim_song", result.dim_song),
    ]:
        rows = full.collect()
        spark.createDataFrame(rows, full.schema).coalesce(1).write.mode("overwrite").parquet(
            wh.dds(name)
        )


def load_dds(spark: SparkSession, wh: Warehouse) -> DdsTables | None:
    """Load the DDS star. Dims are driver-materialized (collect +
    createDataFrame): they are broadcast-sized by design, and cutting their
    lineage from the parquet paths lets run_dds overwrite those paths without
    stale-file-index failures. The fact table stays file-backed."""
    dim_country = _read_or_empty(spark, wh.dds("dim_country"), DIM_COUNTRY_SCHEMA)
    if dim_country is None:
        return None

    def materialize(df: DataFrame, schema) -> DataFrame:
        return spark.createDataFrame(df.collect(), schema)

    return DdsTables(
        dim_country=materialize(dim_country, DIM_COUNTRY_SCHEMA),
        dim_artist=materialize(
            _read_or_empty(spark, wh.dds("dim_artist"), DIM_ARTIST_SCHEMA), DIM_ARTIST_SCHEMA
        ),
        dim_song=materialize(
            _read_or_empty(spark, wh.dds("dim_song"), DIM_SONG_SCHEMA), DIM_SONG_SCHEMA
        ),
        fact=_read_or_empty(spark, wh.dds("fact_daily_top_100"), FACT_SCHEMA),
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
