"""JDBC egress sink round-trip (SURVEY.md §2.1 S9 — the reference's
Metabase-on-Postgres BI handoff, reference docker-compose.yaml:66-68).

Runs against embedded Derby (in-JVM, ships with Spark) so the test is
hermetic: write a mart-shaped frame through the parallel JDBC sink, read
it back through the JDBC source, assert row equality; then exercise the
overwrite mode the BI refresh path uses."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_last_fm_spark.sources.jdbc import read_jdbc, write_jdbc

DERBY = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(DERBY)
        return True
    except Exception:  # noqa: BLE001
        return False


@pytest.fixture(scope="module")
def derby_url(spark):
    if not _derby_available(spark):
        pytest.skip("Derby driver not on the Spark classpath")
    return "jdbc:derby:memory:etl_bi_test;create=true"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_jdbc_round_trip(spark, derby_url):
    mart = spark.createDataFrame(
        [("2021-04-01", "artist a", 3), ("2021-04-01", "artist b", 1),
         ("2021-04-02", "artist a", 2)],
        "date string, artist_name string, cnt_appearance int",
    )
    write_jdbc(mart, derby_url, "appearances", mode="overwrite", driver=DERBY)
    back = read_jdbc(spark, derby_url, "appearances", driver=DERBY)
    assert sorted(back.columns) == sorted(mart.columns)
    assert _rows(back.select(*mart.columns)) == _rows(mart)


def test_jdbc_overwrite_replaces(spark, derby_url):
    df1 = spark.createDataFrame([(1, "x")], "id int, v string")
    df2 = spark.createDataFrame([(2, "y"), (3, "z")], "id int, v string")
    write_jdbc(df1, derby_url, "ow", mode="overwrite", driver=DERBY)
    write_jdbc(df2, derby_url, "ow", mode="overwrite", driver=DERBY)
    back = read_jdbc(spark, derby_url, "ow", driver=DERBY)
    assert _rows(back.select("id", "v")) == [(2, "y"), (3, "z")]


def test_jdbc_append_and_connection_cap(spark, derby_url):
    df = spark.range(0, 100).select(
        F.col("id").cast("int").alias("id"), F.lit("r").alias("v")
    ).repartition(16)
    write_jdbc(df, derby_url, "caps", mode="overwrite", driver=DERBY,
               num_partitions=4)
    write_jdbc(df, derby_url, "caps", mode="append", driver=DERBY,
               num_partitions=4)
    back = read_jdbc(spark, derby_url, "caps", driver=DERBY)
    assert back.count() == 200
    # partitioned read: range predicates parallelize the scan
    part = read_jdbc(spark, derby_url, "caps", driver=DERBY,
                     partition_column="id", lower_bound=0, upper_bound=100,
                     num_partitions=4)
    assert part.rdd.getNumPartitions() == 4
    assert part.count() == 200


def test_jdbc_staged_swap_round_trip(spark, derby_url):
    """VERDICT r11 item 4: write_jdbc_staged writes <table>__stage then
    swaps server-side in one transaction — target flips old -> new
    wholesale, and the stage table is gone after the swap."""
    from etl_pipeline_last_fm_spark.sources.jdbc import (
        _jdbc_table_exists,
        write_jdbc_staged,
    )

    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    v2 = spark.createDataFrame([(3, "c"), (4, "d"), (5, "e")], "id int, v string")
    write_jdbc_staged(v1, derby_url, "bi_mart", driver=DERBY)
    back = read_jdbc(spark, derby_url, "bi_mart", driver=DERBY)
    assert _rows(back.select("id", "v")) == [(1, "a"), (2, "b")]
    # refresh: target existed — drop + rename happen in one transaction
    write_jdbc_staged(v2, derby_url, "bi_mart", driver=DERBY)
    back = read_jdbc(spark, derby_url, "bi_mart", driver=DERBY)
    assert _rows(back.select("id", "v")) == [(3, "c"), (4, "d"), (5, "e")]
    assert not _jdbc_table_exists(spark, derby_url, "bi_mart__stage", DERBY)


def test_jdbc_staged_mid_write_failure_never_corrupts_target(spark, derby_url):
    """The reason the helper exists: a failure DURING the parallel stage
    write (simulated with a task-level raise_error half-way through the
    rows) must leave the live target byte-identical to its pre-refresh
    content — the failed run touched only the stage table. A plain
    write_jdbc overwrite would have already dropped the target."""
    from etl_pipeline_last_fm_spark.sources.jdbc import write_jdbc_staged

    good = spark.createDataFrame([(1, "keep"), (2, "keep")], "id int, v string")
    write_jdbc_staged(good, derby_url, "bi_guard", driver=DERBY)

    poison = spark.range(0, 100).select(
        F.col("id").cast("int").alias("id"),
        F.when(F.col("id") < 50, F.lit("r")).otherwise(
            F.raise_error(F.lit("mid-write failure"))
        ).alias("v"),
    )
    with pytest.raises(Exception, match="mid-write failure"):
        write_jdbc_staged(poison, derby_url, "bi_guard", driver=DERBY)
    back = read_jdbc(spark, derby_url, "bi_guard", driver=DERBY)
    assert _rows(back.select("id", "v")) == [(1, "keep"), (2, "keep")]
    # and the next successful refresh replaces the leftover stage cleanly
    v2 = spark.createDataFrame([(9, "new")], "id int, v string")
    write_jdbc_staged(v2, derby_url, "bi_guard", driver=DERBY)
    back = read_jdbc(spark, derby_url, "bi_guard", driver=DERBY)
    assert _rows(back.select("id", "v")) == [(9, "new")]
