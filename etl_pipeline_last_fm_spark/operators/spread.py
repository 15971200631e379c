"""Scale-adaptive scan spreading for CPU-bound text/vector projections.

Guide §2.5 ("input skew: one huge unsplittable file ... otherwise
repartition immediately after the read"): the driver testdata parquet is
written as ONE row group per table, so every scan planned over it executes
as ONE task no matter how the byte ranges are split — and the dedup tier's
expensive per-row projections (shingling explodes, winnowing gram hashes,
32-permutation MinHash folds) inherit that serial floor. ``spread_scan``
repairs exactly that case and ONLY that case: when the physical scan
yields fewer partitions than the session's default parallelism, the rows
are hash-repartitioned on the given key so downstream per-row work uses
the whole machine; when the input is already parallel (the 100 TB case —
many files / row groups), the frame is returned UNCHANGED and no shuffle
is added. The gate makes the device scale-adaptive rather than a
local[32] constant: the partition count is read from the planned scan,
the target from ``sparkContext.defaultParallelism`` (cores on local[n],
cluster cores otherwise).

Hash partitioning on the row key (not round-robin) on purpose: it is
deterministic under task retry (guide §2.5's SPARK-38388 caveat) and
skips round-robin's sort-before-repartition pass. All consumers in this
engine are input-order-insensitive by contract — certified against the
hostile ``reorder`` adversary (scripts/hostile_parity.py), which scrambles
row order and multi-files the same tables this device re-distributes.

Call this on scan-level frames only (scans/filters/projections): the
partition-count probe plans the frame's physical RDD, which is free for
exchange-less subtrees but would materialize AQE query stages for a plan
that already contains a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_scan(df: DataFrame, *keys: str) -> DataFrame:
    """Repartition ``df`` on ``keys`` to the session's default parallelism
    iff its planned scan has fewer partitions than that — a no-op on
    already-parallel input."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *keys)
