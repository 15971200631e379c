"""Bucketed tables: shuffle-free co-located joins for repeated big joins.

A fact-to-fact join shuffles BOTH sides on the key, every query, forever.
When the same join key recurs across a workload (lineitem ⋈ orders on
orderkey is the canonical case), pre-bucketing both tables on that key at
write time moves the shuffle from query time to (one-off) write time:
Spark records the bucket spec in the catalog, and a join of two tables
bucketed on the join key with the same bucket count plans with NO Exchange
on either side — each task zips bucket i with bucket i. At 100 TB this is
the difference between re-shuffling terabytes per query and never
shuffling them again (the test asserts zero Exchange nodes in the plan).

Bucketing requires the table catalog (``saveAsTable``): the bucket spec
lives in metastore metadata, not in the files — plain ``.parquet(path)``
writes lose it. Bucket count is fixed at write time and both sides must
match; pick it off target file sizes (same arithmetic as
``write_compacted``) and re-bucket only when volume growth degrades it.

``spark.sql.sources.bucketing.enabled`` defaults true; the reader derives
one task per bucket, so bucket count also bounds scan parallelism — at
100 TB use >= cluster cores buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist df as a catalog table bucketed (and optionally sorted) on
    ``bucket_cols``. Sorting within buckets additionally removes the Sort
    step from downstream sort-merge joins on the key."""
    writer = df.write.format("parquet").mode(mode).bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
