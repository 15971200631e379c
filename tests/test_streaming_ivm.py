"""Streaming incremental-join maintenance: the delta-rule fold over a
tagged delta stream must equal the one-shot join of everything seen, under
replays AND under the crash window where the a/b states committed but the
m state did not (the fold reads pre-batch state versions, so the replayed
batch cannot double-count its own deltas)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_last_fm_spark.streaming.ivm import (
    join_fold_batch,
    read_join_state,
    streaming_join_maintenance,
)

SCHEMA = "side string, k long, a_val string, b_val long"


def _tagged(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _batches(spark):
    # key 1: A in batch 0, extra B rows in batch 2 (one-sided + dup bag rows)
    # key 2: A in batch 1, B in batch 0 (A-delta against B-state)
    # key 3: A only (never joins)
    b0 = _tagged(spark, [("a", 1, "a1", None), ("b", 1, None, 10),
                         ("b", 2, None, 20)])
    b1 = _tagged(spark, [("a", 2, "a2", None), ("a", 3, "a3", None)])
    b2 = _tagged(spark, [("b", 1, None, 11), ("b", 1, None, 11)])
    return [b0, b1, b2]


WANT = sorted([(1, "a1", 10), (1, "a1", 11), (1, "a1", 11), (2, "a2", 20)])


def test_stream_fold_equals_one_shot_join(spark, tmp_path):
    root = str(tmp_path / "jst")
    for i, b in enumerate(_batches(spark)):
        join_fold_batch(b, i, root, ["k"])
    got = sorted(map(tuple, read_join_state(spark, root).collect()))
    assert got == WANT


def test_stream_fold_replay_is_noop(spark, tmp_path):
    root = str(tmp_path / "jst")
    batches = _batches(spark)
    join_fold_batch(batches[0], 0, root, ["k"])
    join_fold_batch(batches[0], 0, root, ["k"])  # replay
    join_fold_batch(batches[1], 1, root, ["k"])
    join_fold_batch(batches[2], 2, root, ["k"])
    join_fold_batch(batches[2], 2, root, ["k"])  # replay
    got = sorted(map(tuple, read_join_state(spark, root).collect()))
    assert got == WANT


def test_stream_fold_crash_between_side_and_m_commit(spark, tmp_path):
    """Simulate the crash window: batch 2's a/b states committed but the
    m commit never landed (deleted here). The replayed fold must read the
    PRE-batch a/b versions — otherwise batch 2's own deltas double."""
    import shutil

    root = str(tmp_path / "jst")
    batches = _batches(spark)
    join_fold_batch(batches[0], 0, root, ["k"])
    join_fold_batch(batches[1], 1, root, ["k"])
    join_fold_batch(batches[2], 2, root, ["k"])
    # "crash": the m commit for batch 2 is lost; a/b v=2 survive.
    shutil.rmtree(tmp_path / "jst" / "m" / "_v=2")
    join_fold_batch(batches[2], 2, root, ["k"])  # replay after restart
    got = sorted(map(tuple, read_join_state(spark, root).collect()))
    assert got == WANT


def test_streaming_join_maintenance_end_to_end(spark, tmp_path):
    """A REAL availableNow stream over tagged delta files: maintained M
    equals the one-shot join regardless of file->batch assignment (the
    delta rule is split-invariant)."""
    src = str(tmp_path / "src")
    rows = [("a", 1, "a1", None), ("b", 1, None, 10), ("a", 2, "a2", None),
            ("b", 2, None, 20), ("b", 1, None, 11), ("a", 3, "a3", None)]
    _tagged(spark, rows).repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(_tagged(spark, rows).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    root = str(tmp_path / "jst")
    q = (
        streaming_join_maintenance(
            stream, root, ["k"], checkpoint=str(tmp_path / "ck")
        )
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = sorted(map(tuple, read_join_state(spark, root).collect()))
    a = _tagged(spark, rows).filter("side = 'a'").select("k", "a_val")
    b = _tagged(spark, rows).filter("side = 'b'").select("k", "b_val")
    want = sorted(map(tuple, a.join(b, "k").collect()))
    assert got == want


def test_join_fold_rejects_unprefixed_payload_and_prefixed_keys(spark, tmp_path):
    import pytest

    root = str(tmp_path / "jst")
    bad = spark.createDataFrame(
        [("a", 1, "x")], "side string, k long, payload string"
    )
    with pytest.raises(ValueError, match="unprefixed payload"):
        join_fold_batch(bad, 0, root, ["k"])
    bad2 = spark.createDataFrame(
        [("a", 1, "x")], "side string, a_id long, a_val string"
    )
    with pytest.raises(ValueError, match="side prefixes"):
        join_fold_batch(bad2, 0, root, ["a_id"])
