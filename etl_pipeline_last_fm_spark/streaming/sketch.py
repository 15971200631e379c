"""Incremental sketch maintenance on a stream (foreachBatch merge).

The sketch states in operators/sketch.py are mergeable DataFrames:
- HLL registers merge by MAX per (group, bucket);
- CMS grids merge by SUM per (depth, cell).
That associativity is exactly what incremental maintenance needs: each
micro-batch computes its own tiny sketch, then folds it into a persisted
state table with one bounded merge — no reprocessing of history, state
size fixed at |groups|·m registers (HLL) / d·w cells (CMS) forever.

Replay safety: foreachBatch is AT-LEAST-ONCE — after a failure Structured
Streaming re-runs the last micro-batch with the SAME batch_id. HLL's max
merge is naturally idempotent, but a CMS sum (or a mart count) folded twice
silently inflates. Every fold here therefore persists the last applied
batch_id inside the state itself (constant ``__bid`` column, written in the
SAME parquet commit as the data so marker and state cannot diverge) and
no-ops when a replayed batch_id <= last applied. This relies on Structured
Streaming's per-query monotonically increasing batch ids and the
single-writer guarantee; multi-writer state needs a transactional table
format (same caveat as the idempotent sink).

This is the foreachBatch pattern (same as streaming/ingest.py's idempotent
merge): the batch DataFrame is sketched with the SAME operator code the
batch engine uses, so stream-maintained state provably equals the batch
sketch of the union of all micro-batches (tested in tests/test_sketch.py
and tests/test_zorder_wsample.py, including a double-fold replay case).

Scale: per micro-batch cost is one partial+final aggregate of the batch
plus a merge against a kilobyte-scale state table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_last_fm_spark.operators.sketch import cms_counters

#: Constant column carrying the last applied micro-batch id in every
#: persisted state row. Written atomically with the data (one parquet
#: commit), read back by the replay guard; stripped by the read_* helpers.
BID_COL = "__bid"


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path, jvm) for any Spark path scheme (file://, hdfs://,
    s3a://...). All state-layout probing goes through the Hadoop FS API —
    a driver-local os.path check silently reports False for every remote
    URI, which would make each batch overwrite the accumulated state with
    its own partial."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath, jvm


def list_state_versions(spark: SparkSession, root: str) -> list[tuple[int, str]]:
    """Committed state snapshots under ``root``, ascending by batch_id.
    A snapshot counts as committed only once its ``_SUCCESS`` marker
    exists — a crash mid-write leaves a marker-less directory that every
    reader ignores. Directory names start with ``_`` so a stray
    ``spark.read.parquet(root)`` fails loudly (Spark skips underscore
    children) instead of silently unioning every snapshot."""
    fs, jroot, jvm = _hadoop_fs(spark, root)
    if not fs.exists(jroot):
        return []
    out: list[tuple[int, str]] = []
    for st in fs.listStatus(jroot):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("_v=")):
            continue
        try:
            bid = int(name[3:])
        except ValueError:
            continue
        if fs.exists(jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")):
            out.append((bid, str(st.getPath())))
    if not out:
        # Legacy-layout tripwire (ADVICE r5 item 3): a pre-versioning state
        # directory holds bare parquet part files at the root. Returning []
        # would silently treat a populated durable state as "first batch"
        # and restart the fold from empty — silent data loss. Fail loudly
        # and point at the one-shot migration instead.
        for st in fs.listStatus(jroot):
            name = st.getPath().getName()
            if st.isFile() and name.startswith("part-"):
                raise ValueError(
                    f"state root {root!r} holds a flat (pre-versioning) "
                    "parquet snapshot; migrate once with: "
                    "commit_state(spark.read.parquet(root_tmp), root, "
                    "batch_id=-1) after moving the old files to root_tmp"
                )
    return sorted(out)


def commit_state(state_df: DataFrame, root: str, batch_id: int,
                 retain: int = 2) -> None:
    """Crash-safe state commit: write the new snapshot to its OWN
    versioned directory (``root/_v=<batch_id>``), then prune snapshots
    older than the newest ``retain``. The previous snapshot is deleted
    only AFTER the new one's ``_SUCCESS`` exists, so at every instant at
    least one complete copy of the state is on disk — the mode("overwrite")
    -over-the-only-copy crash window this replaces destroyed the
    accumulated state if the writer died mid-commit. Overwrite semantics
    apply only WITHIN a version: a replay that crashed mid-write re-runs
    with the same batch_id and clobbers its own partial, never a committed
    older snapshot. The write target is never the read source, so no
    localCheckpoint is needed to defuse the read-what-you-overwrite trap
    (lineage is one snapshot deep by construction: prev parquet + batch)."""
    spark = state_df.sparkSession
    target = f"{root.rstrip('/')}/_v={int(batch_id)}"
    state_df.write.mode("overwrite").parquet(target)
    for _bid, p in list_state_versions(spark, root)[:-max(1, int(retain))]:
        fs, jp, _ = _hadoop_fs(spark, p)
        fs.delete(jp, True)


def _read_state_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    """Latest committed state snapshot, or None before the first commit."""
    versions = list_state_versions(spark, path)
    if not versions:
        return None
    return spark.read.parquet(versions[-1][1])


def read_latest_state(spark: SparkSession, path: str) -> DataFrame:
    """Latest committed snapshot; raises if no commit has landed yet."""
    prev = _read_state_or_none(spark, path)
    if prev is None:
        raise FileNotFoundError(f"no committed state snapshot under {path}")
    return prev


def _strip_bid(df: DataFrame) -> DataFrame:
    return df.drop(BID_COL) if BID_COL in df.columns else df


def last_applied_batch(prev: DataFrame | None) -> int:
    """Highest batch_id folded into a state table (-1 if none/legacy)."""
    if prev is None or BID_COL not in prev.columns:
        return -1
    row = prev.agg(F.max(BID_COL).alias("b")).first()
    return -1 if row is None or row["b"] is None else int(row["b"])


def merge_cms_grids(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cellwise sum of two CMS counter grids (associative, commutative)."""
    return (
        a.unionByName(b)
        .groupBy("__d", "__cell")
        .agg(F.sum("__cnt").alias("__cnt"))
    )


def cms_fold_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_path: str,
    token_col: str = "tok",
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms1",
) -> None:
    """Fold ONE micro-batch's CMS grid into the persisted state. Module-level
    (not a closure) so the at-least-once replay guard is directly testable:
    calling this twice with the same batch_id must be a no-op the second
    time — CMS sums are not idempotent, unlike HLL maxima."""
    spark = batch_df.sparkSession
    prev = _read_state_or_none(spark, state_path)
    if int(batch_id) <= last_applied_batch(prev):
        return  # replayed micro-batch, already folded
    grid = cms_counters(batch_df, token_col, depth=depth, width=width, salt=salt)
    if prev is not None:
        grid = merge_cms_grids(_strip_bid(prev), grid)
    grid = grid.withColumn(BID_COL, F.lit(int(batch_id)))
    commit_state(grid, state_path, batch_id)


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
    summed into the parquet state at ``state_path`` (replay-guarded, see
    cms_fold_batch). Returns a DataStreamWriter — the caller picks the
    trigger and calls ``.start()``."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        cms_fold_batch(
            batch_df, batch_id, state_path,
            token_col=token_col, depth=depth, width=width, salt=salt,
        )

    writer = events_stream.writeStream.foreachBatch(fold)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


def read_cms_state(spark: SparkSession, state_path: str) -> DataFrame:
    return _strip_bid(read_latest_state(spark, state_path))


def merge_hll_registers(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Register-wise MAX of two HLL register tables (associative,
    commutative, idempotent — replayed batches cannot inflate the
    estimate, unlike CMS sums; the batch_id guard still applies for
    uniformity and to skip wasted work)."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "__bkt")
        .agg(F.max("__mj").alias("__mj"))
    )


def hll_fold_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_path: str,
    value_col: str,
    group_cols: list[str],
    b: int = 6,
    salt: str = "hll1",
) -> None:
    """Fold ONE micro-batch's HLL registers into the persisted state
    (replay-guarded; see cms_fold_batch for why)."""
    from etl_pipeline_last_fm_spark.functions.scalar import portable_hash60
    from etl_pipeline_last_fm_spark.operators.sketch import _hll_rank

    m = 1 << b
    width = 60 - b
    spark = batch_df.sparkSession
    prev = _read_state_or_none(spark, state_path)
    if int(batch_id) <= last_applied_batch(prev):
        return
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
    if prev is not None:
        regs = merge_hll_registers(_strip_bid(prev), regs, group_cols)
    regs = regs.withColumn(BID_COL, F.lit(int(batch_id)))
    commit_state(regs, state_path, batch_id)


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
    ``hll_estimate_from_registers`` over ``read_hll_state(...)`` turns it
    into counts on demand. Returns a DataStreamWriter — the caller picks
    the trigger and calls ``.start()``."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        hll_fold_batch(
            batch_df, batch_id, state_path,
            value_col=value_col, group_cols=group_cols, b=b, salt=salt,
        )

    writer = stream.writeStream.foreachBatch(fold)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


def read_hll_state(spark: SparkSession, state_path: str) -> DataFrame:
    return _strip_bid(read_latest_state(spark, state_path))
