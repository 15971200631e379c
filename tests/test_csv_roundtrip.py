"""S5/S6 (SURVEY.md §2.1): the reference's CSV detour — ';' delimiter,
explicit header (dags/transformed_from_s3_to_pg.py:52-68, COPY ... DELIMITER
';' at :84-91). The engine doesn't need the intermediate, but the capability
(delimited text sink/source with declared schema) must exist and round-trip
losslessly."""

from __future__ import annotations

from etl_pipeline_last_fm_spark.schemas import ODS_SCHEMA
from etl_pipeline_last_fm_spark.sources.tables import load_table


def test_csv_roundtrip_semicolon_header(spark, sf_dir, tmp_path):
    path = str(tmp_path / "csv_out")
    src = load_table(spark, sf_dir, "nation")
    (
        src.write.option("sep", ";")
        .option("header", "true")
        .mode("overwrite")
        .csv(path)
    )
    back = (
        spark.read.option("sep", ";")
        .option("header", "true")
        .schema(src.schema)  # schema-on-read: never infer in production paths
        .csv(path)
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_ods_csv_shape_matches_reference_columns(spark, tmp_path):
    """The ODS CSV header column order is part of the reference contract
    (transformed_from_s3_to_pg.py:58)."""
    rows = [("S", "A", 100, 10, 1, "2024-01-01", "X")]
    df = spark.createDataFrame(
        [(s, a, d, l, r, __import__("datetime").date.fromisoformat(dt), c)
         for s, a, d, l, r, dt, c in rows],
        ODS_SCHEMA,
    )
    path = str(tmp_path / "ods_csv")
    df.write.option("sep", ";").option("header", "true").mode("overwrite").csv(path)
    back = spark.read.option("sep", ";").option("header", "true").schema(ODS_SCHEMA).csv(path)
    assert back.columns == [
        "song_name", "artist_name", "duration_sec", "listeners_count",
        "song_rank", "source_date", "country",
    ]
    assert back.count() == 1
