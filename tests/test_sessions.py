"""Sessionization: batch vs oracle (in test_oracle_parity via the query
entry) and streaming-stateful vs batch equivalence across micro-batches."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_pipeline_last_fm_spark.operators.sessions import sessionize
from etl_pipeline_last_fm_spark.sources.tables import load_table
from etl_pipeline_last_fm_spark.streaming.sessions import streaming_sessionize


def test_streaming_sessionize_matches_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")

    # Split events into 3 files by time so maxFilesPerTrigger=1 forces the
    # state to survive micro-batch boundaries.
    src = str(tmp_path / "ev_files")
    parts = ev.withColumn(
        "bucket", F.ntile(3).over(__import__("pyspark").sql.Window.orderBy("ts"))
    )
    for b in (1, 2, 3):
        (
            parts.filter(F.col("bucket") == b)
            .drop("bucket")
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        streaming_sessionize(stream, gap_minutes=30)
        .writeStream.format("memory")
        .queryName("sess_updates")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    updates = spark.sql("SELECT * FROM sess_updates")
    # Latest update per (user, session_start) wins (update semantics).
    w = __import__("pyspark").sql.Window.partitionBy("user_id", "session_start").orderBy(
        F.col("n_events").desc()
    )
    final = (
        updates.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", "session_start", "session_end", "n_events", "session_value")
    )
    got = sorted(map(tuple, final.collect()))

    want = sorted(
        map(
            tuple,
            sessionize(ev, gap_minutes=30)
            .select("user_id", "session_start", "session_end", "n_events", "session_value")
            .collect(),
        )
    )
    assert got == want
