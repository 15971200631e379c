"""Parquet table catalog for the driver testdata and engine warehouses.

The reference's table scans are ``FROM ods.daily_data`` / ``FROM dds.*``
(e.g. reference dags/from_ods_to_dds_pg.py:48,61,78,96). Here a "table" is a
parquet path; Spark's InMemoryFileIndex provides partition discovery, so the
reference's explicit S3 LIST step (dags/transformed_from_s3_to_pg.py:17-28)
has no code here at all — listing happens inside the scan node.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table. Column pruning & predicate pushdown reach the
    parquet reader automatically because callers express filters/projections
    declaratively on the returned DataFrame.

    ``events.parquet`` stores TIMESTAMP(NANOS), which Spark's reader rejects
    unless nanos are surfaced as long — so that conf is enabled here and the
    ``ts`` column is normalized back to a (microsecond) timestamp, keeping
    every downstream expression engine-portable."""
    # Runtime-settable SQL confs; required before the scan is analyzed.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The rebuilt events.ts below is an instant; rendering (date_format etc.)
    # must agree with the timezone-naive DuckDB oracle regardless of the
    # caller session's default timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # Integer div (not /1000.0): double rounding at 1e18 ns would shift
        # timestamps by whole microseconds.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_testdata(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register each testdata parquet as a temp view so SQL-form queries can
    name tables the way the DuckDB oracle does."""
    from etl_pipeline_last_fm_spark.schemas import TESTDATA_TABLES

    for name in tables or TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            spark.read.parquet(path).createOrReplaceTempView(name)
