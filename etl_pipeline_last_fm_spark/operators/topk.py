"""Windowed top-k ("the chart operator", SURVEY.md §2.8 O2).

The reference ingests ranks pre-computed by the Last.fm API (``limit: 100``
at reference dags/raw_from_api_to_s3.py:42; rank extraction at
dags/transformed_from_s3_to_pg.py:40). When the engine must *produce* a
chart from raw events, the idiomatic realization is
``row_number() over (partition by group order by metric desc, tiebreaker)``
filtered to ``<= k``.

Scale note: Spark's WindowExec for row_number+filter(rank<=k) applies a
per-partition top-k (WindowGroupLimit / rank-limit pushdown in recent Spark)
so each shuffle partition only keeps k rows per group before the final
window — the plan survives groups with billions of rows. The tiebreaker
makes output deterministic for the oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def windowed_top_k(
    df: DataFrame,
    partition_cols: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Keep the top-k rows per group, emitting their 1-based rank."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
