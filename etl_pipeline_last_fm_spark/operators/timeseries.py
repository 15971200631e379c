"""Calendar gap-fill — the time-series densification operator.

The reference's unit of processing is the daily partition (SURVEY.md §1.1);
days with no data simply have no rows (`dags/transformed_from_s3_to_pg.py`
writes nothing on an empty partition). Downstream consumers — dashboards,
moving averages, SCD point-in-time reads — need a DENSE calendar: one row
per (key, day) with gap semantics made explicit. This is TimescaleDB's
``time_bucket_gapfill`` + ``locf()`` re-expressed relationally:

- **zero-fill** for flow metrics (event counts: a missing day really is 0);
- **LOCF** (last observation carried forward) for state metrics (a balance
  or level holds until the next observation).

Scale shape: per-key [min, max] bounds come from one aggregate; the
calendar explode emits span-many rows per key from that single bounds row
(the generator input is tiny by construction); the observation join is
equi on (key, day); the LOCF fill is one window per key ordered by day.
Nothing global anywhere — keys fan out across the cluster, and a key's
cost is its own span, never the corpus's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_daily(
    obs: DataFrame,
    key_col: str,
    date_col: str,
    zero_cols: list[str] | None = None,
    locf_cols: list[str] | None = None,
) -> DataFrame:
    """Densify ``obs`` (one row per observed (key, date)) to every calendar
    day in each key's [min(date), max(date)] span.

    ``zero_cols`` fill gaps with 0 (flow metrics); ``locf_cols`` carry the
    last observed value forward (state metrics). Adds ``was_observed``
    marking real rows. Column order: key, date, zero_cols, locf_cols,
    was_observed."""
    zero_cols = zero_cols or []
    locf_cols = locf_cols or []
    bounds = obs.groupBy(key_col).agg(
        F.min(date_col).alias("__lo"), F.max(date_col).alias("__hi")
    )
    cal = bounds.select(
        key_col,
        F.explode(F.expr("sequence(__lo, __hi, interval 1 day)")).alias(date_col),
    )
    marked = obs.withColumn("__obs", F.lit(1))
    joined = cal.join(marked, [key_col, date_col], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out_cols = (
        [F.col(key_col), F.col(date_col)]
        + [F.coalesce(F.col(c), F.lit(0)).alias(c) for c in zero_cols]
        + [F.last(c, ignorenulls=True).over(w).alias(c) for c in locf_cols]
        + [F.col("__obs").isNotNull().alias("was_observed")]
    )
    return joined.select(*out_cols)


def gapfill_daily_oracle_sql(
    obs_sql: str,
    key_col: str,
    date_col: str,
    zero_cols: list[str] | None = None,
    locf_cols: list[str] | None = None,
) -> str:
    """DuckDB twin: generate_series calendar per key, LEFT JOIN back, zero
    via COALESCE, LOCF via last_value(... IGNORE NULLS)."""
    zero_cols = zero_cols or []
    locf_cols = locf_cols or []
    zero_sel = "".join(
        f",\n               COALESCE(o.{c}, 0) AS {c}" for c in zero_cols
    )
    locf_sel = "".join(
        f""",\n               last_value(o.{c} IGNORE NULLS) OVER (
                   PARTITION BY cal.{key_col} ORDER BY cal.{date_col}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS {c}"""
        for c in locf_cols
    )
    return f"""
        WITH obs AS ({obs_sql}),
        bounds AS (
            SELECT {key_col}, min({date_col}) AS lo, max({date_col}) AS hi
            FROM obs GROUP BY {key_col}
        ),
        cal AS (
            SELECT {key_col},
                   unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS {date_col}
            FROM bounds
        )
        SELECT cal.{key_col}, cal.{date_col}{zero_sel}{locf_sel},
               (o.{date_col} IS NOT NULL) AS was_observed
        FROM cal LEFT JOIN obs o
          ON cal.{key_col} = o.{key_col} AND cal.{date_col} = o.{date_col}
    """


# --- Exponential decay fold (round 6) ----------------------------------


def ema_halflife(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-key exponential moving average with α = ½ and zero init —
    the ORDER-DEPENDENT recurrence  s₀ = 0,  sᵢ = (sᵢ₋₁ + vᵢ) div 2
    over events sorted by (epoch-µs, tiebreak), in exact integer cents
    (α = ½ keeps the whole trajectory in integers; the division
    truncates toward zero on BOTH engines — Spark's double→long cast
    and DuckDB's integer ``//`` — including for negative running sums,
    so refund-style negative values stay bit-identical too). This is
    the one aggregation class a commutative SUM/AVG cannot express:
    the result depends on event ORDER, not just the multiset.

    Plan shape: one shuffle to the key, array_sort(collect_list) for the
    deterministic order (shuffle-order-proof — same device as the
    MATCH_RECOGNIZE encode), then F.aggregate folds the recurrence
    inside codegen. Per-key state is one long; per-key cost is the
    key's own history. A streaming twin would carry s as its fold
    state — the recurrence is associative-composable under (s, n)
    pairs only for α = ½ per-element steps, which is exactly what the
    batch fold replays. Oracle: list_reduce(list_prepend(0, list(v
    ORDER BY ...)), (acc, x) -> (acc + x) // 2)."""
    from etl_pipeline_last_fm_spark.functions.scalar import half_up_round, ts_us

    cents = half_up_round(F.col(value_col) * 100).cast("long")
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                ts_us(F.col(ts_col)).alias("us"),
                F.col(tiebreak_col).alias("tb"),
                cents.alias("v"),
            )
        )
    )
    return (
        events.groupBy(F.col(key_col).alias("key"))
        .agg(arr.alias("__a"))
        .select(
            F.col("key").alias(key_col),
            F.size("__a").cast("long").alias("n_events"),
            F.aggregate(
                "__a",
                F.lit(0).cast("long"),
                # Truncating halve: double→long cast truncates toward
                # zero, matching DuckDB // for negative sums too (floor
                # would differ by 1 there). Exact: cents « 2^53.
                lambda acc, s: ((acc + s["v"]) / F.lit(2)).cast("long"),
            ).alias("ema_cents"),
        )
    )


def ema_halflife_oracle_sql(table: str = "events") -> str:
    """DuckDB twin of ``ema_halflife``: the same zero-init ½-decay fold
    via list_reduce over the (ts, tiebreak)-ordered value list."""
    return f"""
        SELECT user_id,
               CAST(LEN(l) AS BIGINT) AS n_events,
               CAST(list_reduce(
                   list_prepend(CAST(0 AS BIGINT), l),
                   (acc, x) -> (acc + x) // 2
               ) AS BIGINT) AS ema_cents
        FROM (
            SELECT user_id,
                   list(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                        ORDER BY epoch_us(ts), event_id) AS l
            FROM {table}
            GROUP BY user_id
        )
    """
