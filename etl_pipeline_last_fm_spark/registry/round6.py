"""Round-6 additions: MATCH_RECOGNIZE per-match MEASURES and the round's
later capability waves. Ordering lives in __spark_entry__.py; this module
only implements.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_pipeline_last_fm_spark.sources.tables import load_table


def q_event_pattern_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-match MEASURES for the MATCH_RECOGNIZE-lite operator (VERDICT
    r5 item 5): ONE ROW PER MATCH of 'view, any clicks, purchase' (vc*p)
    carrying match_no and the first/last event id + epoch-µs timestamp of
    the match — recovered from the symbol string via gap/match prefix
    sums and mapped back through the sorted struct array (the string's
    i-th char IS the array's i-th element), no event re-scan. The oracle
    replays the same position arithmetic over string_split_regex +
    regexp_extract_all in DuckDB."""
    from etl_pipeline_last_fm_spark.operators.patterns import (
        match_event_pattern_measures,
    )

    ev = load_table(spark, sf_dir, "events")
    return match_event_pattern_measures(ev, "vc*p")


QUERIES = {
    "event_pattern_measures": q_event_pattern_measures,
}


def oracles() -> dict[str, str]:
    from etl_pipeline_last_fm_spark.operators.patterns import (
        match_event_pattern_measures_oracle_sql,
    )

    return {
        "event_pattern_measures": match_event_pattern_measures_oracle_sql(
            "vc*p"
        ),
    }
