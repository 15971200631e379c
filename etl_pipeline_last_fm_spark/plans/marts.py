"""DM aggregate marts (reference dags/from_dds_to_dm_pg.py, scripts/ddl_dm.sql).

Each mart is a pure function of (fact, dims) — so unlike the reference,
whose mart INSERTs are NOT idempotent (no ON CONFLICT,
dags/from_dds_to_dm_pg.py:46-79; Appendix A.4), the engine recomputes or
overwrite-by-date-partitions and re-runs are no-ops by construction.

Physical shape of all three: join fact x dim (bounded dims hint-broadcast;
the corpus-scaled dim_song is left to size-based planning + AQE), then a
partial+final hash aggregate on (date, dim attribute) — one shuffle each,
on the group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_last_fm_spark.functions.scalar import round2
from etl_pipeline_last_fm_spark.schemas import ROYALTY_RATE


def mart_avg_duration_by_country(fact: DataFrame, dim_song: DataFrame, dim_country: DataFrame) -> DataFrame:
    """AVG(duration_sec) per (date, country) — reference
    dags/from_dds_to_dm_pg.py:47-52, scripts/ddl_dm.sql:2-7 (A1/J4/J5)."""
    return (
        # dim_song UNHINTED (corpus-scaled — a forced broadcast OOMs at
        # 100 TB; AQE broadcasts it at runtime when it actually fits);
        # dim_country stays hinted (bounded by countries on Earth).
        fact.join(dim_song, "song_id")
        .join(F.broadcast(dim_country), "country_id")
        .groupBy("date", "country_name")
        # Exact integer sum + ONE final IEEE division (round-9 float-sum
        # audit): Spark's avg(int) accumulates in double, which stays exact
        # only while the partial sums fit 2^53; the long sum is exact at
        # any scale and the single division is deterministic. Values are
        # bit-identical to the float path inside the 2^53 envelope.
        .agg(
            F.sum(F.col("duration_sec").cast("long")).alias("__s"),
            F.count("duration_sec").alias("__n"),
        )
        .select(
            "date",
            "country_name",
            (F.col("__s").cast("double") / F.col("__n")).alias("avg_duration_sec"),
        )
    )


def mart_artist_appearances(fact: DataFrame, dim_artist: DataFrame) -> DataFrame:
    """COUNT(*) chart appearances per (date, artist) — reference
    dags/from_dds_to_dm_pg.py:61-65, scripts/ddl_dm.sql:10-14 (A2/J6)."""
    return (
        fact.join(F.broadcast(dim_artist), "artist_id")
        .groupBy("date", "artist_name")
        .agg(F.count(F.lit(1)).alias("cnt_appearance"))
    )


def mart_expected_royalties(fact: DataFrame, dim_artist: DataFrame, rate: float = ROYALTY_RATE) -> DataFrame:
    """ROUND(SUM(listeners_count) * rate, 2) per (date, artist), ordered by
    date asc, royalties desc — reference dags/from_dds_to_dm_pg.py:74-79,
    scripts/ddl_dm.sql:18-23 (A3/F2/F3/O1)."""
    return (
        fact.join(F.broadcast(dim_artist), "artist_id")
        .groupBy("date", "artist_name")
        .agg(round2(F.sum("listeners_count") * F.lit(rate)).alias("royalties"))
        .orderBy(F.col("date"), F.col("royalties").desc())
    )
