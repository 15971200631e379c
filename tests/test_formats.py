"""Additional source/sink formats beyond parquet/CSV/JSON: ORC round-trip
and JSON-Lines round-trip with declared schemas (schema-on-read — never
infer in production paths), including the timestamp column both flavors.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_last_fm_spark.sources.tables import load_table


def test_orc_roundtrip_events(spark, sf_dir, tmp_path):
    """ORC sink + source with declared schema round-trips the event log,
    including the timestamp column, exactly."""
    path = str(tmp_path / "orc_out")
    src = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    src.write.mode("overwrite").orc(path)
    back = spark.read.schema(src.schema).orc(path)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_jsonl_roundtrip_documents(spark, sf_dir, tmp_path):
    """JSON-Lines (one object per line — the interchange format LLM corpus
    tooling actually ships) round-trips documents with a declared schema."""
    path = str(tmp_path / "jsonl_out")
    src = load_table(spark, sf_dir, "documents")
    src.write.mode("overwrite").json(path)
    back = spark.read.schema(src.schema).json(path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_orc_predicate_pushdown(spark, sf_dir, tmp_path):
    """Filters reach the ORC scan the same way they reach parquet."""
    path = str(tmp_path / "orc_pp")
    load_table(spark, sf_dir, "lineitem").write.mode("overwrite").orc(path)
    df = spark.read.orc(path).filter(F.col("l_orderkey") == 1).select(
        "l_orderkey", "l_quantity"
    )
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters" in plan and "l_orderkey" in plan.split("ReadSchema")[1]
