"""Sequential pattern matching over event streams (MATCH_RECOGNIZE-lite).

The reference has no sequential-pattern operator (its event logic stops at
joins and GROUP BY, reference `dags/from_dds_to_dm_pg.py`); funnels count
stage membership and `session_transitions` counts adjacent pairs, but
neither can express ORDER-sensitive multi-step patterns with quantifiers
("a view, then any number of clicks, then a purchase"). SQL:2016's
MATCH_RECOGNIZE is the standard answer; Spark has no native support, so
the same semantics are lowered to a plan Spark runs well:

1. encode each partition's time-ordered event stream as a SYMBOL STRING
   (one character per event type) — one ordered aggregation per user;
2. run the pattern as a REGEX over that string — leftmost,
   non-overlapping matches, exactly MATCH_RECOGNIZE's default
   AFTER MATCH SKIP PAST LAST ROW semantics.

Determinism + parity: the encoding orders by (epoch-µs, event_id) — a
total order — and both engines count leftmost non-overlapping matches of
the same regex (verified cross-engine in the registered query; keep
patterns in the portable subset: literals, classes, `*` `+` `?`
quantifiers — no lookaround, which RE2-family engines reject).

Scale shape: one shuffle on the partition key for the ordered encode
(collect_list buffers ONE user's events — per-user streams are bounded
by retention in practice; a pathological user is the same hot-key
problem every per-user window has, and salting applies the same way);
the regex scan is a pure per-row map over |users| short strings, inside
codegen. This is the 100 TB-honest lowering: the event table is read
once, nothing quadratic, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_pipeline_last_fm_spark.functions.scalar import ts_us

#: Default single-char alphabet for the events fixture's event types.
DEFAULT_ALPHABET = {
    "view": "v",
    "click": "c",
    "purchase": "p",
    "signup": "s",
    "error": "e",
}


def _symbol(col: Column, alphabet: dict[str, str]) -> Column:
    expr = F.lit("?")
    for k, v in sorted(alphabet.items(), reverse=True):
        expr = F.when(col == k, F.lit(v)).otherwise(expr)
    return expr


def encode_event_strings(
    events: DataFrame,
    alphabet: dict[str, str] | None = None,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """(user, symbol string) — each user's events as one ordered string.
    Ordered via array_sort over (epoch_µs, tiebreak, symbol) structs, so
    the result is a pure function of the row set (shuffle-order-proof)."""
    alphabet = alphabet or DEFAULT_ALPHABET
    return (
        events.select(
            F.col(user_col).alias("user_id"),
            F.struct(
                ts_us(F.col(ts_col)).alias("us"),
                F.col(tiebreak_col).alias("tb"),
                _symbol(F.col(type_col), alphabet).alias("c"),
            ).alias("__s"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("__s")), lambda s: s["c"]
                ),
                "",
            ).alias("events_str")
        )
    )


def match_event_pattern(
    events: DataFrame,
    pattern: str,
    alphabet: dict[str, str] | None = None,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per user: total events, leftmost non-overlapping matches of
    ``pattern``, and the first match (MEASURES-lite). Users with zero
    matches are kept (n_matches = 0) — the funnel-drop-off rows matter."""
    enc = encode_event_strings(
        events, alphabet, user_col, type_col, ts_col, tiebreak_col
    )
    # Pattern passed as a COLUMN LITERAL (F.lit / the builtin's literal
    # conversion), never interpolated into SQL text: f-string-into-F.expr
    # mangles backslashes (SQL literal parsing eats them -> silent
    # cross-engine divergence on patterns like v\\dp) and breaks on
    # quotes (injection surface). Verified live in review.
    return enc.select(
        "user_id",
        F.length("events_str").cast("long").alias("n_events"),
        F.regexp_count("events_str", F.lit(pattern))
        .cast("long")
        .alias("n_matches"),
        F.coalesce(
            F.regexp_extract("events_str", pattern, 0), F.lit("")
        ).alias("first_match"),
    )


def match_event_pattern_oracle_sql(
    pattern: str, alphabet: dict[str, str] | None = None
) -> str:
    """DuckDB twin over the events table: string_agg with the same total
    order, regexp_extract_all for the leftmost non-overlapping count."""
    alphabet = alphabet or DEFAULT_ALPHABET
    case = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in sorted(alphabet.items())
    )
    # DuckDB standard string literals do not process backslashes, so only
    # single quotes need escaping for a safe SQL literal.
    pattern = pattern.replace("'", "''")
    return f"""
        WITH enc AS (
            SELECT user_id,
                   string_agg(CASE event_type {case} ELSE '?' END, ''
                              ORDER BY epoch_us(ts), event_id) AS s
            FROM events
            GROUP BY user_id
        )
        SELECT user_id,
               CAST(length(s) AS BIGINT) AS n_events,
               CAST(len(regexp_extract_all(s, '{pattern}')) AS BIGINT)
                 AS n_matches,
               COALESCE(regexp_extract(s, '{pattern}', 0), '') AS first_match
        FROM enc
    """
