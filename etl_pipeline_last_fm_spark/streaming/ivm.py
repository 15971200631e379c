"""Streaming incremental JOIN maintenance (foreachBatch delta-rule fold).

Completes the IVM family: operators/incremental.py maintains aggregates
(additive states) and batch-mode joins (incremental_join_batches); this
module maintains a materialized two-sided inner join CONTINUOUSLY from
one stream of TAGGED deltas — each row carries a ``side`` column ('a' or
'b') plus that side's payload columns. Per micro-batch the fold applies
the delta rule

    ΔM = ΔA ⋈ B_state ∪ A_state ⋈ ΔB ∪ ΔA ⋈ ΔB

then appends ΔA/ΔB to the side states and ΔM to the join state. The
delta rule bounds the JOIN COMPUTE to O(|Δ| × matched-state); the
snapshot COMMIT in this implementation still rewrites each full state
per batch (commit_state writes whole versioned snapshots — at true
materialized-join scale the commit layout must become append/partitioned
so the I/O matches the compute bound; the algebra is unchanged). All
three states ride the crash-safe versioned commit protocol
(streaming/sketch.py commit_state) under ONE shared replay guard: the
batch_id is stamped into each state and the fold no-ops when replayed,
because ΔM appends (unlike HLL maxima) double-count on replay.

Why one tagged stream rather than two readStreams: foreachBatch binds a
single streaming source per query, and a union-of-sources with a side
tag is the standard lowering — it also gives the delta rule its
atomicity (one batch carries BOTH sides' deltas, so the ΔΔ term is
well-defined per batch).

Equality contract (tested): after any prefix of batches, read_join_state
equals the one-shot inner join of all side-a rows seen ⋈ all side-b rows
seen — for ANY split of either side across batches, including replays.

Scale: at cluster scale the three states are bucketed on the join key so
every per-batch delta join is exchange-free on the state side; the
per-batch JOIN cost is O(|Δ| × matched-state) — with the append-layout
caveat above for the write side.

State-retention coupling: the crash-window read of pre-batch versions
relies on commit_state's default retain=2 keeping v=batch_id-1 alive
while v=batch_id is being written; the fold asserts the invariant (m
state present => both pre-batch side states present) and raises instead
of silently refolding from empty.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_last_fm_spark.operators.incremental import join_delta
from etl_pipeline_last_fm_spark.streaming.sketch import (
    BID_COL,
    _read_state_or_none,
    _strip_bid,
    commit_state,
    last_applied_batch,
    read_latest_state,
)


def _read_state_before(
    spark: SparkSession, path: str, batch_id: int
) -> DataFrame | None:
    """Latest committed snapshot with version < batch_id — the pre-batch
    state, stable under replays (see join_fold_batch docstring)."""
    from etl_pipeline_last_fm_spark.streaming.sketch import (
        list_state_versions,
    )

    versions = [(b, p) for b, p in list_state_versions(spark, path)
                if b < batch_id]
    if not versions:
        return None
    return spark.read.parquet(versions[-1][1])


def join_fold_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_root: str,
    on: Sequence[str],
    side_col: str = "side",
) -> None:
    """Fold ONE tagged micro-batch into the (a, b, m) state trio.
    Module-level so the replay guard is directly testable. The guard is
    checked against the M state; all three states commit in one fold, M
    LAST. Crash-window safety: a crash after the a/b commits but before
    the m commit replays the batch — the fold therefore reads the a/b
    states at the latest version STRICTLY BEFORE this batch_id
    (_read_state_before), so the replayed fold sees exactly the
    pre-batch states and recommits v=batch_id idempotently; reading the
    LATEST version there would double-count the batch's own deltas."""
    spark = batch_df.sparkSession
    on = list(on)
    m_path = f"{state_root}/m"
    a_path = f"{state_root}/a"
    b_path = f"{state_root}/b"
    prev_m = _read_state_or_none(spark, m_path)
    if int(batch_id) <= last_applied_batch(prev_m):
        return  # replayed micro-batch, already folded
    # Tagged-schema contract, VALIDATED (not just implied): columns are
    # exactly {side} ∪ on ∪ a_-prefixed payload ∪ b_-prefixed payload. A
    # payload column without its side prefix would otherwise be silently
    # dropped from the maintained state; an on-key with a side prefix
    # would be selected twice and break the join.
    cols = set(batch_df.columns)
    bad_on = [k for k in on if k.startswith(("a_", "b_"))]
    if bad_on:
        raise ValueError(f"join keys must not use side prefixes: {bad_on}")
    stray = cols - {side_col} - set(on) - {
        c for c in cols if c.startswith(("a_", "b_"))
    }
    if stray:
        raise ValueError(
            f"unprefixed payload columns would be dropped: {sorted(stray)};"
            " name side-a payloads a_* and side-b payloads b_*"
        )
    da = batch_df.filter(F.col(side_col) == "a").drop(side_col)
    db = batch_df.filter(F.col(side_col) == "b").drop(side_col)
    a_cols = on + [c for c in da.columns if c.startswith("a_")]
    b_cols = on + [c for c in db.columns if c.startswith("b_")]
    da = da.select(*a_cols)
    db = db.select(*b_cols)
    prev_a = _read_state_before(spark, a_path, int(batch_id))
    prev_b = _read_state_before(spark, b_path, int(batch_id))
    if prev_m is not None and (prev_a is None or prev_b is None):
        # m exists => at least one earlier fold committed => both side
        # states MUST have a pre-batch version (commit_state retain >= 2
        # keeps it). Hitting this means retention was lowered or state
        # dirs were tampered with; refolding from empty would silently
        # discard all accumulated side state.
        raise RuntimeError(
            f"pre-batch side state missing under {state_root} for batch"
            f" {batch_id} while m state exists — retention too aggressive?"
        )
    a_state = _strip_bid(prev_a) if prev_a is not None else None
    b_state = _strip_bid(prev_b) if prev_b is not None else None

    delta = join_delta(da, db, a_state, b_state, on)
    if prev_m is not None:
        delta = _strip_bid(prev_m).unionByName(delta)

    new_a = da if a_state is None else a_state.unionByName(da)
    new_b = db if b_state is None else b_state.unionByName(db)
    bid = F.lit(int(batch_id))
    commit_state(new_a.withColumn(BID_COL, bid), a_path, batch_id)
    commit_state(new_b.withColumn(BID_COL, bid), b_path, batch_id)
    # M last: its batch_id is the replay guard for the whole trio.
    commit_state(delta.withColumn(BID_COL, bid), m_path, batch_id)


def streaming_join_maintenance(
    tagged_stream: DataFrame,
    state_root: str,
    on: Sequence[str],
    side_col: str = "side",
    checkpoint: str | None = None,
):
    """Maintain the materialized join over a tagged delta stream. Returns
    a DataStreamWriter — the caller picks the trigger and calls
    ``.start()``; read with ``read_join_state``."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        join_fold_batch(batch_df, batch_id, state_root, on, side_col)

    writer = tagged_stream.writeStream.foreachBatch(fold)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


def read_join_state(spark: SparkSession, state_root: str) -> DataFrame:
    return _strip_bid(read_latest_state(spark, f"{state_root}/m"))
