"""Spark SQL surface parity: the reference's embedded SQL statements
(dags/from_ods_to_dds_pg.py, dags/from_dds_to_dm_pg.py — Jinja dates
substituted, Postgres-isms adapted) must run through spark.sql over temp
views and agree with the operator library's DataFrame plans.

This is the "switching user" guarantee: the SELECT bodies of the reference's
INSERT ... SELECT statements work on this engine's SQL surface.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from etl_pipeline_last_fm_spark.operators.impute import impute_zero_with_partition_mean
from etl_pipeline_last_fm_spark.schemas import ODS_SCHEMA

D = "2024-04-01"

ODS_ROWS = [
    # song, artist, duration, listeners, rank, date, country
    ("Alpha", "A1", 100, 1000, 1, D, "Testland"),
    ("Beta", "A2", 0, 2000, 2, D, "Testland"),
    ("Gamma", "A1", 250, 400, 3, D, "Testland"),
    ("Alpha", "A1", 100, 300, 1, D, "Otherland"),
    ("Delta", "A3", 0, 700, 2, D, "Otherland"),
    # another day, must be excluded by every date-filtered statement
    ("Omega", "A9", 500, 10, 1, "2024-04-02", "Testland"),
]


@pytest.fixture(scope="module")
def ods_view(spark):
    rows = [
        (s, a, d, l, r, datetime.date.fromisoformat(dt), c)
        for s, a, d, l, r, dt, c in ODS_ROWS
    ]
    df = spark.createDataFrame(rows, ODS_SCHEMA)
    df.createOrReplaceTempView("ods_daily_data")
    return df


def test_dim_song_sql_with_scalar_subquery(spark, ods_view):
    """Reference dags/from_ods_to_dds_pg.py:72-81: DISTINCT + CASE WHEN +
    uncorrelated scalar subquery with AVG(...)::INT — near-verbatim on the
    Spark SQL surface (cast adapted per SURVEY.md Appendix A.2)."""
    sql = f"""
        SELECT DISTINCT
            song_name,
            CASE WHEN duration_sec = 0
                 THEN CAST(FLOOR((SELECT AVG(duration_sec)
                                  FROM ods_daily_data
                                  WHERE duration_sec > 0 AND source_date = '{D}') + 0.5) AS INT)
                 ELSE duration_sec
            END AS duration_sec
        FROM ods_daily_data
        WHERE source_date = '{D}'
    """
    got = {(r.song_name, r.duration_sec) for r in spark.sql(sql).collect()}

    # Operator-library equivalent (window-mean imputation).
    lib = impute_zero_with_partition_mean(
        ods_view.filter(F.col("source_date") == D),
        "duration_sec",
        ["source_date"],
        out_col="duration_sec",
    )
    want = {(r.song_name, r.duration_sec) for r in lib.select("song_name", "duration_sec").distinct().collect()}
    assert got == want
    # mean of (100, 250, 100) = 150
    assert ("Beta", 150) in got and ("Delta", 150) in got
    assert ("Omega", 500) not in got


def test_star_and_mart_sql(spark, ods_view):
    """Reference fact build (from_ods_to_dds_pg.py:85-104) + royalties mart
    (from_dds_to_dm_pg.py:73-79) as plain Spark SQL over views."""
    spark.sql(
        f"""
        CREATE OR REPLACE TEMP VIEW dim_artist AS
        SELECT CAST(row_number() OVER (ORDER BY artist_name) AS BIGINT) AS artist_id,
               artist_name
        FROM (SELECT DISTINCT artist_name FROM ods_daily_data WHERE source_date = '{D}')
        """
    )
    roy = spark.sql(
        f"""
        SELECT o.source_date AS date, da.artist_name,
               FLOOR(SUM(o.listeners_count) * 0.003 * 100 + 0.5) / 100 AS royalties
        FROM ods_daily_data o
        JOIN dim_artist da ON da.artist_name = o.artist_name
        WHERE o.source_date = '{D}'
        GROUP BY o.source_date, da.artist_name
        ORDER BY date, royalties DESC
        """
    ).collect()
    got = {(r.artist_name, float(r.royalties)) for r in roy}
    assert got == {
        ("A1", round((1000 + 400 + 300) * 0.003, 2)),
        ("A2", round(2000 * 0.003, 2)),
        ("A3", round(700 * 0.003, 2)),
    }
    # ORDER BY date asc, royalties desc: A2 (6.0) > A1 (5.1) > A3 (2.1)
    assert [r.artist_name for r in roy] == ["A2", "A1", "A3"]
