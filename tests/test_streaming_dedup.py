"""Streaming exact dedup: duplicates across micro-batch files collapse to
one row; the surviving set equals batch-mode distinct-by-key."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_pipeline_last_fm_spark.streaming.dedup import streaming_exact_dedup


def test_streaming_dedup_across_files(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    base = dt.datetime(2024, 1, 1, 12, 0, 0)

    def batch(ids, minutes):
        return spark.createDataFrame(
            [(i, base + dt.timedelta(minutes=minutes + (i % 3))) for i in ids],
            "event_id long, ts timestamp",
        )

    # two files with overlapping ids 5..9, all within the watermark horizon
    batch(range(0, 10), 0).write.parquet(str(src / "f1"))
    batch(range(5, 15), 5).write.parquet(str(src / "f2"))

    stream = spark.readStream.schema("event_id long, ts timestamp").parquet(
        f"{src}/*"
    )
    out: list = []

    q = (
        streaming_exact_dedup(stream, ("event_id",), "ts", "1 hour")
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _id: out.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    ids = sorted(r["event_id"] for r in out)
    assert ids == list(range(15)), ids  # each id exactly once


def test_streaming_dedup_restart_is_exactly_once(spark, tmp_path):
    """Checkpoint + availableNow restart must not re-emit already-output
    keys when the same files are still in the source directory."""
    src = tmp_path / "src"
    src.mkdir()
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    spark.createDataFrame(
        [(i, base) for i in range(5)], "event_id long, ts timestamp"
    ).write.parquet(str(src / "f1"))

    def run():
        got: list = []
        stream = spark.readStream.schema("event_id long, ts timestamp").parquet(
            f"{src}/*"
        )
        q = (
            streaming_exact_dedup(stream)
            .writeStream.outputMode("append")
            .foreachBatch(lambda df, _id: got.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return got

    first = run()
    assert sorted(r["event_id"] for r in first) == [0, 1, 2, 3, 4]
    second = run()  # restart against the same checkpoint: nothing new
    assert second == []
