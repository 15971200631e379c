"""Column profiling — the data-quality summary every ingest runs first.

One aggregation pass computes (rows, non-nulls, distincts, min, max,
rounded mean) for every requested column, then the single result row is
unpivoted driver-free with ``stack`` into one row per column. The wide-agg-
then-stack shape matters at 100 TB: it is ONE scan and ONE partial+final
aggregate over the table regardless of how many columns are profiled —
never a per-column pass. (Multiple count-distincts do expand the plan;
Spark rewrites them via a single expand+aggregate, still one scan.)

The DuckDB oracle is the transparent per-column UNION ALL of the same
aggregates — a deliberately different plan computing the same answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_last_fm_spark.functions.scalar import half_up_round


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Profile numeric columns: one output row per column with
    (col_name, n_rows, n_nonnull, n_distinct, min_val, max_val, avg_val)."""
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            F.countDistinct(c).alias(f"__nd_{c}"),
            F.min(F.col(c).cast("double")).alias(f"__min_{c}"),
            F.max(F.col(c).cast("double")).alias(f"__max_{c}"),
            half_up_round(F.avg(c), 4).alias(f"__avg_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __min_{c}, __max_{c}, __avg_{c}" for c in cols
    )
    return wide.selectExpr(
        "__n AS n_rows",
        f"stack({len(cols)}, {stack_args}) AS "
        "(col_name, n_nonnull, n_distinct, min_val, max_val, avg_val)",
    ).select("col_name", "n_rows", "n_nonnull", "n_distinct", "min_val", "max_val", "avg_val")


def profile_columns_oracle_sql(cols: list[str], table: str = "lineitem") -> str:
    """DuckDB twin: per-column UNION ALL of the same aggregates, with the
    shared floor-trick rounding on the mean."""
    parts = [
        f"""
        SELECT '{c}' AS col_name,
               COUNT(*) AS n_rows,
               COUNT({c}) AS n_nonnull,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS DOUBLE) AS min_val,
               CAST(MAX({c}) AS DOUBLE) AS max_val,
               FLOOR(AVG({c}) * 10000 + 0.5) / 10000 AS avg_val
        FROM {table}
        """
        for c in cols
    ]
    return " UNION ALL ".join(parts)
