"""JDBC egress sink — the reference's BI-tier handoff (SURVEY.md §2.1 S9).

The reference exposes its marts to Metabase through Postgres (reference
docker-compose.yaml:66-68: Metabase's connection points at the warehouse
database the DM DAG loads). This engine's primary mart layout is Parquet
(directly queryable by Spark's own JDBC/Thrift endpoint and every lake
engine), but for a literal Metabase/Postgres-style handoff this module
writes any DataFrame through Spark's built-in JDBC data source.

Scale posture: the JDBC write is a PARALLEL executor-side sink (one
connection per partition, batched inserts of ``batchsize`` rows), so the
same file-count policy as the Parquet sinks applies in reverse — cap the
partition count with ``num_partitions`` so a 1000-executor job does not
open 1000 simultaneous connections against one BI database. The write is
NOT atomic across partitions (JDBC has no commit protocol spanning
connections); idempotent re-runs should target a staging table + server
side swap, or use ``mode="overwrite"`` with ``truncate`` — both exposed.

Tested against Derby (embedded, in-JVM — ships with Spark), which keeps
the round-trip test hermetic; the options are standard Spark JDBC and work
unchanged against Postgres with the driver jar on the classpath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    driver: str | None = None,
    num_partitions: int | None = 8,
    batchsize: int = 10_000,
    truncate: bool = False,
    isolation_level: str = "READ_COMMITTED",
    options: dict[str, str] | None = None,
) -> None:
    """Write ``df`` to a JDBC table.

    ``num_partitions`` caps concurrent connections (coalesce, not
    repartition: no shuffle — JDBC sinks are connection-bound, not
    CPU-bound). ``truncate`` with mode="overwrite" issues TRUNCATE TABLE
    instead of DROP+CREATE, preserving server-side grants/indexes — the
    same reason the reference's DM loader deletes-then-inserts rather
    than recreating tables (reference dags/from_dds_to_dm_pg.py)."""
    if num_partitions is not None and df.rdd.getNumPartitions() > num_partitions:
        df = df.coalesce(num_partitions)
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .option("isolationLevel", isolation_level)
        .mode(mode)
    )
    if truncate:
        writer = writer.option("truncate", "true")
    if driver:
        writer = writer.option("driver", driver)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.save()


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Read a JDBC table (the ingest direction, for completeness).

    Without ``partition_column`` the read is ONE task — fine for dims,
    wrong for facts; with it, Spark issues ``num_partitions`` range
    predicates so the scan parallelizes (the JDBC analogue of partition
    pruning)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load()
