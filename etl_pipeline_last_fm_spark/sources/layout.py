"""Output-layout writers: the two file-layout problems every large sink hits.

``write_sorted`` — globally ordered output without a global sort:
``repartitionByRange`` samples the sort key to build range boundaries, each
partition sorts locally, and file i is entirely <= file i+1. Total order
across files, no single-partition stage anywhere (the same reason
``orderBy`` alone is fine for a LIMIT but wrong as a write plan: Spark
would still range-partition, but an explicit repartitionByRange lets the
caller pick the file count instead of inheriting shuffle.partitions).

``write_compacted`` — the small-files fix: one pass to count (cheap:
parquet metadata when possible), then ``repartition(ceil(n/target))`` so
every output file lands near the target row count. A 100 TB table written
at shuffle-partition granularity produces millions of KB-sized files that
throttle every later scan on listing + open overhead; compaction at write
time is cheaper than a follow-up OPTIMIZE pass.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write globally range-ordered parquet: file boundaries are sampled
    range splits on ``sort_cols``, rows sorted within each file."""
    (
        df.repartitionByRange(n_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(path)
    )


def write_compacted(
    df: DataFrame,
    path: str,
    target_rows_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> int:
    """Write parquet with ~target_rows_per_file per output file; returns
    the file count used. The count() pass is the price of a deterministic
    layout — for append-mode streams prefer maxRecordsPerFile, which caps
    file size without the extra action but can still emit tiny tail files
    per task."""
    owned = not df.is_cached
    if owned:
        df = df.persist()
    try:
        n = df.count()
        n_files = max(1, math.ceil(n / target_rows_per_file))
        df.repartition(n_files).write.mode(mode).parquet(path)
    finally:
        # Only release a cache WE took (ADVICE r11): Spark persistence is
        # not refcounted, so unpersisting a caller-persisted frame would
        # silently evict the caller's cache.
        if owned:
            df.unpersist()
    return n_files


def write_compacted_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    target_rows_per_file: int = 1_000_000,
    mode: str = "overwrite",
    dynamic_overwrite: bool = True,
) -> int:
    """``write_compacted`` for hive-partitioned sinks (the daily marts):
    spread the rows across ``ceil(n/target)`` round-robin tasks BEFORE the
    ``partitionBy`` write, so a single-date run (where hash-repartitioning
    on the partition column would collapse back to one task — the exact
    ``coalesce(1)`` bottleneck this replaces) still writes in parallel.
    File-count bound: tasks × dates-per-task, i.e. ``n_files`` per date
    directory for the daily single-date case. The frame is persisted around
    the count+write pair so the plan (an aggregate at mart scale) is not
    computed twice; returns the task count used."""
    owned = not df.is_cached
    if owned:
        df = df.persist()
    try:
        n = df.count()
        n_files = max(1, math.ceil(n / target_rows_per_file))
        writer = df.repartition(n_files).write.mode(mode)
        if dynamic_overwrite:
            writer = writer.option("partitionOverwriteMode", "dynamic")
        writer.partitionBy(*partition_cols).parquet(path)
    finally:
        # Cache-ownership rule as in write_compacted (ADVICE r11).
        if owned:
            df.unpersist()
    return n_files
