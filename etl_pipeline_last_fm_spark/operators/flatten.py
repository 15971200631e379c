"""Raw chart document -> flat ODS rows.

Re-expresses the reference's row-at-a-time flatten ``get_transformed_data``
(reference dags/transformed_from_s3_to_pg.py:31-45) as a single native
``explode`` + ``cast`` + partition-column select — no UDF, fully inside
whole-stage codegen (SURVEY.md §2.12: "the key don't-port-re-express item").

Cast semantics: the reference's Python ``int()`` raises on malformed input;
here malformed numerics become NULL via ``try_cast`` regardless of the
session's ANSI mode (SURVEY.md Appendix A.6 documented deviation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def flatten_raw_chart(raw: DataFrame) -> DataFrame:
    """DataFrame[tracks, ingest_date, country] -> ODS-shaped rows.

    One input document yields up to 100 rows (the API's `limit`,
    reference dags/raw_from_api_to_s3.py:42) — `explode` IS the unnest
    (SURVEY.md §2.2 P1/P2).
    """
    track = F.explode(F.col("tracks.track")).alias("t")
    return (
        raw.select(track, "ingest_date", "country")
        .select(
            F.col("t.name").alias("song_name"),
            F.col("t.artist.name").alias("artist_name"),
            F.col("t.duration").try_cast("int").alias("duration_sec"),
            F.col("t.listeners").try_cast("int").alias("listeners_count"),
            # The API field is "@attr"; bracket access avoids dot-path parsing.
            F.col("t")["@attr"]["rank"].try_cast("int").alias("song_rank"),
            # Partition columns re-injected as data columns
            # (reference injects them as literals, transformed_from_s3_to_pg.py:41-42).
            F.col("ingest_date").cast("date").alias("source_date"),
            F.col("country"),
        )
    )
