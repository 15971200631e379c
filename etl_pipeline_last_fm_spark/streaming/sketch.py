"""Incremental sketch maintenance on a stream (foreachBatch merge).

The sketch states in operators/sketch.py are mergeable DataFrames:
- HLL registers merge by MAX per (group, bucket);
- CMS grids merge by SUM per (depth, cell).
That associativity is exactly what incremental maintenance needs: each
micro-batch computes its own tiny sketch, then folds it into a persisted
state table with one bounded merge — no reprocessing of history, state
size fixed at |groups|·m registers (HLL) / d·w cells (CMS) forever.

This is the foreachBatch pattern (same as streaming/ingest.py's idempotent
merge): the batch DataFrame is sketched with the SAME operator code the
batch engine uses, so stream-maintained state provably equals the batch
sketch of the union of all micro-batches (tested in tests/test_sketch.py).

Scale: per micro-batch cost is one partial+final aggregate of the batch
plus a merge against a kilobyte-scale state table. The state read-merge-
overwrite is safe under the single-writer-per-query guarantee Structured
Streaming provides; multi-writer state needs a transactional table format
(same caveat as the idempotent sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_last_fm_spark.operators.sketch import cms_counters


def _read_state_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    """Read persisted state, or None on first batch. Probed by READING,
    not os.path.exists(): the state path is a Spark path (hdfs://, s3a://,
    file://...) and a driver-local existence check silently reports False
    for every remote URI — which would make each batch overwrite the
    accumulated state with its own partial."""
    try:
        return spark.read.parquet(path)
    except Exception as exc:  # AnalysisException: PATH_NOT_FOUND on batch 0
        if "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc):
            return None
        raise


def merge_cms_grids(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cellwise sum of two CMS counter grids (associative, commutative)."""
    return (
        a.unionByName(b)
        .groupBy("__d", "__cell")
        .agg(F.sum("__cnt").alias("__cnt"))
    )


def streaming_cms_maintenance(
    events_stream: DataFrame,
    state_path: str,
    token_col: str = "tok",
    depth: int = 4,
    width: int = 1024,
    checkpoint: str | None = None,
    salt: str = "cms1",
):
    """Maintain a CMS grid over a token stream: each micro-batch's grid is
    summed into the parquet state at ``state_path``. Returns a
    DataStreamWriter — the caller picks the trigger and calls
    ``.start()``."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        grid = cms_counters(
            batch_df, token_col, depth=depth, width=width, salt=salt
        )
        prev = _read_state_or_none(spark, state_path)
        if prev is not None:
            grid = merge_cms_grids(prev, grid)
        # localCheckpoint cuts the lineage back to the (tiny) merged grid
        # so the overwrite never reads the file it is replacing.
        grid.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            state_path
        )

    writer = events_stream.writeStream.foreachBatch(fold)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


def read_cms_state(spark: SparkSession, state_path: str) -> DataFrame:
    return spark.read.parquet(state_path)


def merge_hll_registers(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Register-wise MAX of two HLL register tables (associative,
    commutative, idempotent — replayed batches cannot inflate the
    estimate, unlike CMS sums)."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "__bkt")
        .agg(F.max("__mj").alias("__mj"))
    )


def streaming_hll_maintenance(
    stream: DataFrame,
    state_path: str,
    value_col: str,
    group_cols: list[str],
    b: int = 6,
    salt: str = "hll1",
    checkpoint: str | None = None,
):
    """Maintain per-group HLL registers over a stream: each micro-batch's
    registers fold into the parquet state by register-wise max. The state
    is the full sketch — |groups| * 2^b rows forever — and
    ``hll_estimate_from_registers`` turns it into counts on demand.
    Returns a DataStreamWriter — the caller picks the trigger and calls
    ``.start()``."""
    from etl_pipeline_last_fm_spark.functions.scalar import portable_hash60
    from etl_pipeline_last_fm_spark.operators.sketch import _hll_rank

    m = 1 << b
    width = 60 - b

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        h = portable_hash60(
            F.concat(F.lit(salt), F.lit(":"), F.col(value_col).cast("string"))
        )
        regs = (
            batch_df.select(
                *group_cols,
                h.bitwiseAND(F.lit(m - 1)).alias("__bkt"),
                _hll_rank(F.shiftright(h, b), width).alias("__mj"),
            )
            .groupBy(*group_cols, "__bkt")
            .agg(F.max("__mj").alias("__mj"))
        )
        prev = _read_state_or_none(spark, state_path)
        if prev is not None:
            regs = merge_hll_registers(prev, regs, group_cols)
        regs.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            state_path
        )

    writer = stream.writeStream.foreachBatch(fold)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer
