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
