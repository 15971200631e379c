"""Marketing-attribution analytics: credit each conversion event to the
most recent preceding touch within a recency window.

The reference pipeline's mart layer counts artist appearances per day
(SURVEY.md §2.4); attribution is the same events-stream analytics family
one step further — "which touch gets credit for this purchase" is the
canonical funnel-adjacent question a production events mart answers.

Semantics (last-touch): for every conversion event, find the LAST event
of a touch type strictly before it (same key, (epoch-µs, tiebreak)
order). If that touch is within ``window_us``, the conversion is
attributed to the touch's type; otherwise (no touch, or a stale one) to
``'none'``. Credit is summed in exact integer cents.

Scale shape: ONE window pass per key ordered by time — the running
last-touch is `last(touch_struct, ignorenulls=True)` over an
UNBOUNDED-PRECEDING..-1 frame, which Spark evaluates as a running
accumulator (no per-row re-scan), then a low-cardinality groupBy on the
attributed channel. Identical to the sessionize plan: one shuffle on the
key, everything else streams within the partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_pipeline_last_fm_spark.functions.scalar import half_up_round, ts_us


def last_touch_attribution(
    events: DataFrame,
    touch_types: tuple[str, ...] = ("view", "click"),
    conversion_type: str = "purchase",
    window_us: int = 7 * 86_400_000_000,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """(channel, n_conversions, attributed_cents): conversions credited
    to the type of the last in-window preceding touch, else 'none'."""
    us = ts_us(F.col(ts_col))
    cents = half_up_round(F.col(value_col) * 100).cast("long")
    w = (
        Window.partitionBy(key_col)
        .orderBy(us.asc(), F.col(tiebreak_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col(type_col).isin(*touch_types),
        F.struct(us.alias("us"), F.col(type_col).alias("t")),
    )
    last_touch = F.last(touch, ignorenulls=True).over(w)
    channel = F.when(
        last_touch.isNotNull() & (us - last_touch["us"] <= F.lit(window_us)),
        last_touch["t"],
    ).otherwise(F.lit("none"))
    return (
        events.select(
            F.col(type_col),
            channel.alias("channel"),
            cents.alias("__cents"),
        )
        .filter(F.col(type_col) == conversion_type)
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.sum("__cents").alias("attributed_cents"),
        )
    )


def last_touch_attribution_oracle_sql(
    touch_types: tuple[str, ...] = ("view", "click"),
    conversion_type: str = "purchase",
    window_us: int = 7 * 86_400_000_000,
    table: str = "events",
) -> str:
    """DuckDB twin: last_value(... IGNORE NULLS) over the identical
    frame, same in-window/else-'none' credit rule."""
    in_list = ", ".join(f"'{t}'" for t in touch_types)
    return f"""
        WITH tagged AS (
            SELECT event_type,
                   CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
                   epoch_us(ts) AS us,
                   last_value(
                       CASE WHEN event_type IN ({in_list})
                            THEN struct_pack(us := epoch_us(ts),
                                             t := event_type) END
                       IGNORE NULLS
                   ) OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS lt
            FROM {table}
        )
        SELECT CASE WHEN lt IS NOT NULL AND us - lt.us <= {window_us}
                    THEN lt.t ELSE 'none' END AS channel,
               CAST(COUNT(*) AS BIGINT) AS n_conversions,
               CAST(SUM(cents) AS BIGINT) AS attributed_cents
        FROM tagged
        WHERE event_type = '{conversion_type}'
        GROUP BY 1
    """
