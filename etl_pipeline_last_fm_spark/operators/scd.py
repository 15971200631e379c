"""Type-2 slowly-changing-dimension history building.

The reference warehouse keeps only current-state dims (dds dim_country /
dim_artist / dim_song, reference sql/init_dds.sql); the standard upgrade
path when history matters is SCD2 — one row per (entity, attribute-value
run) with a validity interval. Building SCD2 from an event/transaction log
is the gaps-and-islands pattern:

1. per entity, order observations by (event time, tiebreak id);
2. a change flag where the tracked attribute differs from its lag;
3. a running sum of change flags numbers the islands (versions);
4. per island: valid_from = first observation, valid_to = the NEXT
   island's valid_from (half-open intervals, so intervals tile with no
   gaps), NULL for the current version.

All windows partition on the entity key — one shuffle, full parallelism,
no global ordering. At 100 TB the only care is entity-key skew, and a
dimension entity with enough observations to skew a partition is a data
bug, not a plan bug.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    log: DataFrame,
    key: str = "o_custkey",
    attr: str = "o_orderpriority",
    ts: str = "o_orderdate",
    tiebreak: str = "o_orderkey",
) -> DataFrame:
    """Collapse an observation log into SCD2 rows.

    Returns (key, attr, version, valid_from, valid_to, is_current) with
    version numbering from 1 per entity, valid_from/valid_to formatted
    yyyy-MM-dd (half-open; valid_to NULL on the current row).
    """
    wobs = Window.partitionBy(key).orderBy(ts, tiebreak)
    flagged = log.select(
        key,
        attr,
        F.date_format(ts, "yyyy-MM-dd").alias("__d"),
        F.col(tiebreak).alias("__tb"),
    ).withColumn(
        "__chg",
        F.when(
            F.lag(attr).over(
                Window.partitionBy(key).orderBy("__d", "__tb")
            ).eqNullSafe(F.col(attr)),
            F.lit(0),
        ).otherwise(F.lit(1)),
    )
    wrun = Window.partitionBy(key).orderBy("__d", "__tb").rowsBetween(
        Window.unboundedPreceding, 0
    )
    islands = flagged.withColumn("__ver", F.sum("__chg").over(wrun))
    wver = Window.partitionBy(key).orderBy("__ver")
    return (
        islands.groupBy(key, "__ver")
        .agg(
            F.first(attr).alias(attr),
            F.min("__d").alias("valid_from"),
        )
        .withColumn("valid_to", F.lead("valid_from").over(wver))
        .select(
            key,
            attr,
            F.col("__ver").cast("int").alias("version"),
            "valid_from",
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


def scd2_history_oracle_sql(
    key: str = "o_custkey",
    attr: str = "o_orderpriority",
    ts: str = "o_orderdate",
    tiebreak: str = "o_orderkey",
    table: str = "orders",
) -> str:
    """DuckDB twin of scd2_history: identical windows, identical date
    formatting, version pinned to INTEGER."""
    return f"""
        WITH obs AS (
            SELECT {key}, {attr},
                   strftime({ts}, '%Y-%m-%d') AS d,
                   {tiebreak} AS tb
            FROM {table}
        ),
        flagged AS (
            SELECT *, CASE WHEN lag({attr}) OVER w IS NOT DISTINCT FROM {attr}
                           THEN 0 ELSE 1 END AS chg
            FROM obs
            WINDOW w AS (PARTITION BY {key} ORDER BY d, tb)
        ),
        islands AS (
            SELECT *, SUM(chg) OVER (PARTITION BY {key} ORDER BY d, tb
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ver
            FROM flagged
        ),
        runs AS (
            SELECT {key}, ver, MIN({attr}) AS {attr}, MIN(d) AS valid_from
            FROM islands GROUP BY {key}, ver
        )
        SELECT {key}, {attr},
               CAST(ver AS INTEGER) AS version,
               valid_from,
               lead(valid_from) OVER (PARTITION BY {key} ORDER BY ver) AS valid_to,
               lead(valid_from) OVER (PARTITION BY {key} ORDER BY ver) IS NULL
                   AS is_current
        FROM runs
    """
