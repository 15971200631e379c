"""Sequential funnel analysis over an event log.

"Of the users who did A, how many then did B, and then C?" — the product-
analytics staple (and, as a plan shape, the ordered-sequence pattern
MATCH_RECOGNIZE engines special-case). Strict ordering matters: a purchase
BEFORE the first view must not count, so this is not three independent
EXISTS checks.

Spark-first plan: all three stage timestamps are conditional MINs windowed
over the SAME user partition — Catalyst plans one Exchange on user_id and
evaluates the three Window steps on the co-located rows, so the whole
funnel is a single shuffle of the event log, not one join per stage. The
per-user stage label then aggregates to a 1-row-per-stage summary (tiny).

Timestamps compare as integer microseconds (``ts_us``, NTZ-safe ↔ DuckDB
``epoch_us``) — the same cross-engine convention as sessionize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_pipeline_last_fm_spark.functions.scalar import ts_us


def funnel_stages(
    events: DataFrame,
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user deepest funnel stage, strict sequential semantics.

    stage_depth: 0 = never did stages[0]; k = completed stages[0..k-1] in
    order (each stage's first qualifying event strictly after the previous
    stage's). Returns (user_id, stage_depth, stage).
    """
    s1, s2, s3 = stages
    us = ts_us(ts_col)
    w = Window.partitionBy(user_col)
    t1 = events.withColumn(
        "__t1", F.min(F.when(F.col(type_col) == s1, us)).over(w)
    )
    t2 = t1.withColumn(
        "__t2",
        F.min(F.when((F.col(type_col) == s2) & (us > F.col("__t1")), us)).over(w),
    )
    t3 = t2.withColumn(
        "__t3",
        F.min(F.when((F.col(type_col) == s3) & (us > F.col("__t2")), us)).over(w),
    )
    depth = (
        F.when(F.col("__t3").isNotNull(), 3)
        .when(F.col("__t2").isNotNull(), 2)
        .when(F.col("__t1").isNotNull(), 1)
        .otherwise(0)
    )
    label = (
        F.when(F.col("__t3").isNotNull(), F.lit("_".join(stages)))
        .when(F.col("__t2").isNotNull(), F.lit("_".join(stages[:2])))
        .when(F.col("__t1").isNotNull(), F.lit(s1))
        .otherwise(F.lit("none"))
    )
    return (
        t3.select(
            user_col,
            depth.cast("int").alias("stage_depth"),
            label.alias("stage"),
        )
        .distinct()
    )


def funnel_summary(
    events: DataFrame,
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
) -> DataFrame:
    """Stage-depth histogram: (stage_depth, stage, n_users)."""
    return (
        funnel_stages(events, stages)
        .groupBy("stage_depth", "stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def funnel_stages_oracle_sql(
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
    table: str = "events",
) -> str:
    """DuckDB twin: the same conditional-min cascade written as explicit
    per-user scalar steps (a deliberately different — join-per-stage —
    plan computing the same strict-sequence answer)."""
    s1, s2, s3 = stages
    return f"""
        WITH u1 AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = '{s1}' THEN epoch_us(ts) END) AS t1
            FROM {table} GROUP BY user_id
        ),
        u2 AS (
            SELECT u1.user_id, u1.t1,
                   MIN(CASE WHEN e.event_type = '{s2}' AND epoch_us(e.ts) > u1.t1
                            THEN epoch_us(e.ts) END) AS t2
            FROM u1 LEFT JOIN {table} e ON e.user_id = u1.user_id
            GROUP BY u1.user_id, u1.t1
        ),
        u3 AS (
            SELECT u2.user_id, u2.t1, u2.t2,
                   MIN(CASE WHEN e.event_type = '{s3}' AND epoch_us(e.ts) > u2.t2
                            THEN epoch_us(e.ts) END) AS t3
            FROM u2 LEFT JOIN {table} e ON e.user_id = u2.user_id
            GROUP BY u2.user_id, u2.t1, u2.t2
        )
        SELECT user_id,
               CAST(CASE WHEN t3 IS NOT NULL THEN 3
                         WHEN t2 IS NOT NULL THEN 2
                         WHEN t1 IS NOT NULL THEN 1
                         ELSE 0 END AS INTEGER) AS stage_depth,
               CASE WHEN t3 IS NOT NULL THEN '{s1}_{s2}_{s3}'
                    WHEN t2 IS NOT NULL THEN '{s1}_{s2}'
                    WHEN t1 IS NOT NULL THEN '{s1}'
                    ELSE 'none' END AS stage
        FROM u3
    """


def funnel_summary_oracle_sql(
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
    table: str = "events",
) -> str:
    return f"""
        SELECT stage_depth, stage, COUNT(*) AS n_users
        FROM ({funnel_stages_oracle_sql(stages, table)})
        GROUP BY stage_depth, stage
    """
