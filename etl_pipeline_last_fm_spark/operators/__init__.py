"""Operator library — each a composable DataFrame -> DataFrame transform.

Core relational set (SURVEY.md §2): flatten, impute, idempotent append,
surrogate keys, star join, windowed top-k. Extension set (BASELINE.json
north-star): dedup family, similarity search, text analysis, multimodal
column plumbing.
"""

from etl_pipeline_last_fm_spark.operators.flatten import flatten_raw_chart
from etl_pipeline_last_fm_spark.operators.impute import impute_zero_with_partition_mean
from etl_pipeline_last_fm_spark.operators.idempotent import first_writer_wins, idempotent_append
from etl_pipeline_last_fm_spark.operators.surrogate import assign_surrogate_keys
from etl_pipeline_last_fm_spark.operators.star import star_join
from etl_pipeline_last_fm_spark.operators.topk import windowed_top_k

__all__ = [
    "flatten_raw_chart",
    "impute_zero_with_partition_mean",
    "first_writer_wins",
    "idempotent_append",
    "assign_surrogate_keys",
    "star_join",
    "windowed_top_k",
]
