"""Stream-static enrichment join: a streaming fact joined to a static
broadcast dimension — the standard streaming lookup pattern (dims load
once per micro-batch plan; no state store involved)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_last_fm_spark.sources.tables import load_table


def test_stream_static_broadcast_enrichment(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    dim = spark.createDataFrame(
        [("view", "browse"), ("click", "browse"), ("purchase", "convert"),
         ("signup", "convert"), ("error", "ops")],
        "event_type string, category string",
    )
    src = str(tmp_path / "ev_src")
    ev.write.parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    enriched = stream.join(F.broadcast(dim), "event_type").groupBy(
        "category"
    ).agg(F.count(F.lit(1)).alias("n"))

    q = (
        enriched.writeStream.format("memory")
        .queryName("enriched_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["category"]: r["n"]
        for r in spark.sql("SELECT * FROM enriched_counts").collect()
    }
    want = {
        r["category"]: r["n"]
        for r in ev.join(dim, "event_type")
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and len(got) == 3
