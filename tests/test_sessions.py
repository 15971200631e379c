"""Sessionization: batch vs oracle (in test_oracle_parity via the query
entry) and streaming-stateful vs batch equivalence across micro-batches."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_pipeline_last_fm_spark.operators.sessions import sessionize
from etl_pipeline_last_fm_spark.sources.tables import load_table
from etl_pipeline_last_fm_spark.streaming.sessions import streaming_sessionize


def test_streaming_late_event_never_moves_session_end_backwards(spark, tmp_path):
    """Cross-batch out-of-order events fold into the open session with
    max/min guards: a late event may extend session_start earlier but must
    not drag session_end backwards (r1 ADVICE regression)."""
    import datetime as dt

    import pandas as pd

    def ev_df(rows):
        return spark.createDataFrame(
            pd.DataFrame(
                {
                    "user_id": [r[0] for r in rows],
                    "ts": [pd.Timestamp(r[1]) for r in rows],
                    "event_id": [r[2] for r in rows],
                    "value": [float(r[3]) for r in rows],
                }
            )
        )

    t = lambda m: dt.datetime(2024, 5, 1, 10, 0) + dt.timedelta(minutes=m)
    batches = [
        [(1, t(0), 1, 1.0), (1, t(10), 2, 2.0)],
        [(1, t(12), 3, 4.0)],
        [(1, t(5), 4, 8.0), (1, t(-5), 5, 16.0)],  # late: mid-session + before start
    ]
    src = str(tmp_path / "late_src")
    os.makedirs(src)
    for i, rows in enumerate(batches):
        ev_df(rows).coalesce(1).write.mode("append").parquet(f"{src}/b{i}")
        os.utime(f"{src}/b{i}", (1000 + i, 1000 + i))

    schema = ev_df(batches[0]).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/b*")
    )
    q = (
        streaming_sessionize(stream, gap_minutes=30)
        .writeStream.format("memory")
        .queryName("late_sess")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "late_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    updates = spark.sql("SELECT * FROM late_sess").collect()
    assert all(not r.closed for r in updates), "no 30-min gap => nothing closes"
    final = max(updates, key=lambda r: r.n_events)
    assert final.session_start == t(-5)
    assert final.session_end == t(12), "late event moved session_end backwards"
    assert (final.n_events, final.session_value) == (5, 31.0)


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
