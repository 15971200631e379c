"""Pin the graded prefix (VERDICT r5 item 9): the driver grades the FIRST
50 queries() entries only, and dict order IS the contract — the membership
assert in __spark_entry__.py cannot catch an accidental reorder that
silently regrades a different window. This list is edited together with
the ordering dict, deliberately, once per rotation."""

from __future__ import annotations

import __spark_entry__ as entrymod

#: Round-10 window: 9 rotation-invariant headliners, then the 37
#: audit-re-attestation entries (VERDICT r9 item 1: every query whose
#: behavior the round-9 float-sum/null-semantics/rank-device commits
#: changed and whose newest CORRECTNESS row predates them, ordered by
#: staleness), then 4 longest-unexercised non-audit backfill anchors.
GRADED_WINDOW_R10 = [
    "flagship_royalties",
    "pricing_summary",
    "star_join",
    "windowed_top_k",
    "idempotent_append",
    "sessionize",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "sim_bruteforce",
    "rank_metrics",
    "unpivot_metrics",
    "bpe_train",
    "streaming_mart_fold",
    "mart_daily_avg",
    "salted_agg",
    "cube_agg",
    "pivot_conditional",
    "rolling_stats",
    "scalar_subquery",
    "window_analytic",
    "date_partition_agg",
    "rollup_agg",
    "pivot_native",
    "shipmode_priority",
    "ema_decay",
    "ema_fold",
    "cusum",
    "tumbling_window",
    "dedup_keep_list",
    "streaming_ema",
    "cusum_fold",
    "streaming_cusum",
    "rfm_segments",
    "time_weighted_avg",
    "twap_fold",
    "streaming_twap",
    "holt_smooth",
    "holt_fold",
    "streaming_holt",
    "skyline_parts",
    "revenue_gini",
    "skyline_fold",
    "streaming_skyline",
    "profile_columns",
    "gapfill_locf",
    "hopping_window",
    "session_window_native",
    "table_checksum",
    "pagerank_weighted",
    "except_all",
]

#: slots 10-46: the audit-touched re-attestation tier (37 entries)
AUDIT_REATTEST = GRADED_WINDOW_R10[9:46]


def test_graded_prefix_is_pinned():
    names = list(entrymod.queries())
    assert names[:50] == GRADED_WINDOW_R10


def test_audit_reattest_tier_size():
    assert len(AUDIT_REATTEST) == 37
    assert len(GRADED_WINDOW_R10) == 50


def test_headliners_lead_the_window():
    from bench import HEADLINE

    assert set(GRADED_WINDOW_R10[:9]) == set(HEADLINE)


def test_every_graded_entry_is_oracle_paired():
    """Every registry entry (205 as of round 9) — a regression here
    silently downgrades a query to the driver's weaker rows-only
    check."""
    oracles = entrymod.oracle_sql()
    assert set(entrymod.queries()) == set(oracles)
