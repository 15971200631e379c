"""Pin the graded prefix (VERDICT r5 item 9): the driver grades the FIRST
50 queries() entries only, and dict order IS the contract — the membership
assert in __spark_entry__.py cannot catch an accidental reorder that
silently regrades a different window. This list is edited together with
the ordering dict, deliberately, once per rotation."""

from __future__ import annotations

import __spark_entry__ as entrymod

#: Round-6 window: 9 rotation-invariant headliners, the 8 round-5-queue
#: entries earning their first driver rows, then the 33 longest-unexercised
#: green anchors (18 round-2-graded + 15 oldest round-3-graded).
GRADED_WINDOW_R6 = [
    "flagship_royalties",
    "pricing_summary",
    "star_join",
    "windowed_top_k",
    "idempotent_append",
    "sessionize",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "sim_bruteforce",
    "priority_promises",
    "important_parts",
    "supplier_part_counts",
    "idle_customers",
    "sssp",
    "event_pattern",
    "incremental_join",
    "streaming_join",
    "order_limit",
    "mart_daily_avg",
    "dedup_passages",
    "cdc_compact",
    "lang_id",
    "snapshot_diff",
    "surrogate_keys_incremental",
    "salted_agg",
    "cube_agg",
    "pivot_conditional",
    "rolling_stats",
    "percentiles",
    "semi_join",
    "outer_join_agg",
    "token_count",
    "text_fingerprint",
    "sim_ann_lsh_multiprobe",
    "sim_ann_ivf",
    "surrogate_keys",
    "dedup_exact",
    "text_quality",
    "pii_scrub",
    "distinct_project",
    "case_impute",
    "scalar_subquery",
    "window_analytic",
    "union_all",
    "json_extract",
    "date_partition_agg",
    "mart_daily_appearances",
    "explode_tokens",
    "rollup_agg",
    "pivot_native",
]

ROUND5_QUEUE = [
    "priority_promises", "important_parts", "supplier_part_counts",
    "idle_customers", "sssp", "event_pattern", "incremental_join",
    "streaming_join",
]


def test_graded_prefix_is_pinned():
    names = list(entrymod.queries())
    assert names[:50] == GRADED_WINDOW_R6


def test_round5_queue_is_in_window():
    assert set(ROUND5_QUEUE) <= set(GRADED_WINDOW_R6)


def test_headliners_lead_the_window():
    from bench import HEADLINE

    assert set(GRADED_WINDOW_R6[:9]) == set(HEADLINE)


def test_every_graded_entry_is_oracle_paired():
    """145/145 since round 6 (sim_ann_ivf's trained-IVF oracle closed the
    last rows-only entry) — a regression here silently downgrades a query
    to the driver's weaker rows-only check."""
    oracles = entrymod.oracle_sql()
    assert set(entrymod.queries()) == set(oracles)
