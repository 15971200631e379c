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
    if num_partitions is not None:
        # coalesce is already a no-op when the frame has <= n partitions —
        # no need to force the plan into an RDD just to read the count
        # (ADVICE r11: df.rdd.getNumPartitions() added planning overhead
        # before every JDBC write).
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


def _jdbc_execute(
    spark: SparkSession,
    url: str,
    statements: list[str],
    driver: str | None = None,
) -> None:
    """Run DDL statements server-side in ONE transaction (autocommit off,
    commit after the last statement, rollback on failure) over a single
    py4j java.sql connection — the missing half of Spark's JDBC sink,
    which only speaks INSERT/CREATE/TRUNCATE."""
    jvm = spark._jvm
    if driver:
        jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        conn.setAutoCommit(False)
        stmt = conn.createStatement()
        try:
            for s in statements:
                stmt.execute(s)
            conn.commit()
        except Exception:
            conn.rollback()
            raise
        finally:
            stmt.close()
    finally:
        conn.close()


def _jdbc_table_exists(
    spark: SparkSession, url: str, table: str, driver: str | None = None
) -> bool:
    jvm = spark._jvm
    if driver:
        jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        md = conn.getMetaData()
        # Unquoted identifiers are case-folded by the engine; check the
        # common foldings rather than guessing the dialect.
        for cand in (table, table.upper(), table.lower()):
            rs = md.getTables(None, None, cand, None)
            try:
                if rs.next():
                    return True
            finally:
                rs.close()
        return False
    finally:
        conn.close()


def write_jdbc_staged(
    df: DataFrame,
    url: str,
    table: str,
    driver: str | None = None,
    num_partitions: int | None = 8,
    batchsize: int = 10_000,
    rename_template: str | None = None,
    options: dict[str, str] | None = None,
) -> None:
    """Idempotent BI refresh (VERDICT r11 What's-missing #2): ``write_jdbc``
    is a parallel multi-connection sink, so a mid-write failure can leave
    the target table half-written — exactly the partial state a BI
    dashboard must never read. This helper writes to ``<table>__stage``
    first, then swaps stage -> target in ONE server-side transaction
    (drop old target if present + rename stage), so readers observe either
    the complete old table or the complete new one, never a prefix.

    Engine support for the transactional swap: Derby and Postgres run DDL
    transactionally (the rollback on a failed swap leaves the old target
    live); Oracle/MySQL autocommit DDL — there the swap degrades to
    crash-consistent-but-not-transactional (MySQL users should prefer its
    atomic multi-RENAME instead, via ``rename_template``). A failure
    during the STAGE write never touches the target on any engine; the
    next run simply overwrites the leftover stage.

    ``rename_template``: ``{stage}``/``{target}`` format string for the
    rename DDL. Defaults per URL: Derby ``RENAME TABLE {stage} TO
    {target}``, else the Postgres-style ``ALTER TABLE {stage} RENAME TO
    {target}``."""
    stage = f"{table}__stage"
    if rename_template is None:
        rename_template = (
            "RENAME TABLE {stage} TO {target}"
            if url.startswith("jdbc:derby")
            else "ALTER TABLE {stage} RENAME TO {target}"
        )
    # Stage write: Spark's overwrite drops + recreates the stage table, so
    # a leftover stage from a previous failed run is replaced wholesale.
    write_jdbc(
        df,
        url,
        stage,
        mode="overwrite",
        driver=driver,
        num_partitions=num_partitions,
        batchsize=batchsize,
        options=options,
    )
    # Server-side swap, one transaction.
    spark = df.sparkSession
    statements = []
    if _jdbc_table_exists(spark, url, table, driver):
        statements.append(f"DROP TABLE {table}")
    statements.append(rename_template.format(stage=stage, target=table))
    _jdbc_execute(spark, url, statements, driver)
