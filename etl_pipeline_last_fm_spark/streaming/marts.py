"""Streaming incremental mart maintenance (foreachBatch additive fold).

The batch contract in operators/incremental.py — additive integer
(sum, count) states, merge-associative — is exactly what a streaming mart
needs: each micro-batch computes ITS OWN partial state and folds it into
the persisted mart state with one bounded merge. The same guarantees
carry over verbatim: late or replayed-out-of-order batches land correctly
because merge order cannot change the result, and the presented mart
equals the batch rebuild of everything seen (tested).

Same single-writer caveat as the other foreachBatch sinks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from etl_pipeline_last_fm_spark.operators.incremental import (
    additive_state,
    merge_states,
)
from etl_pipeline_last_fm_spark.streaming.sketch import _read_state_or_none


def streaming_mart_maintenance(
    stream: DataFrame,
    state_path: str,
    keys: Sequence[str],
    value_col: str,
    checkpoint: str | None = None,
):
    """Fold each micro-batch's additive state into the parquet mart state.
    Read the mart with operators.incremental.present(read_state(...)).
    Returns a DataStreamWriter — the caller picks the trigger and calls
    ``.start()``."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        state = additive_state(batch_df, list(keys), value_col)
        prev = _read_state_or_none(spark, state_path)
        if prev is not None:
            state = merge_states([prev, state], list(keys))
        state.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            state_path
        )

    writer = stream.writeStream.foreachBatch(fold)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


def read_state(spark: SparkSession, state_path: str) -> DataFrame:
    return spark.read.parquet(state_path)
