"""Pin the graded prefix (VERDICT r5 item 9): the driver grades the FIRST
50 queries() entries only, and dict order IS the contract — the membership
assert in __spark_entry__.py cannot catch an accidental reorder that
silently regrades a different window. This list is edited together with
the ordering list in __spark_entry__.py, deliberately, once per rotation.
(An import of entrymod.GRADED_WINDOW_R12 would be circular — the pin is an
independent literal copy by design.)"""

from __future__ import annotations

import __spark_entry__ as entrymod

#: Round-12 window (VERDICT r11 item 2): 9 rotation-invariant headliners,
#: the complete 14-entry r6-vintage backlog (outer_join_agg first, as the
#: r11 pin required), the 26 oldest r7-vintage entries, and ONE deliberate
#: swap in slot 50: streaming_mart_fold re-attests in the round that
#: dropped the forced dim_song broadcast from the streaming DM join
#: (VERDICT r11 item 1). Oldest driver row after this rotation: r7.
GRADED_WINDOW_R12 = [
    "flagship_royalties",
    "pricing_summary",
    "star_join",
    "windowed_top_k",
    "idempotent_append",
    "sessionize",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "sim_bruteforce",
    "outer_join_agg",
    "token_count",
    "text_fingerprint",
    "sim_ann_lsh_multiprobe",
    "sim_ann_ivf",
    "dedup_exact",
    "text_quality",
    "pii_scrub",
    "distinct_project",
    "case_impute",
    "union_all",
    "json_extract",
    "mart_daily_appearances",
    "explode_tokens",
    "event_pattern_measures",
    "forecast_revenue",
    "top_supplier",
    "returned_revenue",
    "promo_revenue",
    "min_cost_supplier",
    "product_profit",
    "dominant_suppliers",
    "link_prediction",
    "attribution",
    "trend_fit",
    "collocations",
    "session_concurrency",
    "contingency_chi2",
    "hashed_features",
    "lead_lag",
    "range_join",
    "funnel",
    "hll_distinct",
    "dedup_simhash",
    "dedup_rolling_fp",
    "embedding_cosine_dedup",
    "sim_ann_lsh",
    "tfidf",
    "top_ngrams",
    "split_assign",
    "streaming_mart_fold",
]

#: slots 10-23: the retired r6-vintage backlog (14 entries)
R6_BACKLOG_TIER = GRADED_WINDOW_R12[9:23]
#: slots 24-49: the r7-vintage freshness tier (26 entries)
R7_VINTAGE_TIER = GRADED_WINDOW_R12[23:49]


def test_graded_prefix_is_pinned():
    names = list(entrymod.queries())
    assert names[:50] == GRADED_WINDOW_R12


def test_freshness_tier_sizes():
    assert len(R6_BACKLOG_TIER) == 14
    assert len(R7_VINTAGE_TIER) == 26
    assert len(GRADED_WINDOW_R12) == 50
    assert GRADED_WINDOW_R12[9] == "outer_join_agg"  # the r11-pinned head
    assert GRADED_WINDOW_R12[49] == "streaming_mart_fold"  # VERDICT r11 #1


def test_headliners_lead_the_window():
    from bench import HEADLINE

    assert set(GRADED_WINDOW_R12[:9]) == set(HEADLINE)


def test_r13_backlog_heads_the_past_cap_line():
    """The 9 r7-vintage entries left out of this window must head the
    past-the-cap line so the round-13 rotation picks them up first."""
    names = list(entrymod.queries())
    assert names[50] == "mixture_sample"
    backlog = set(names[50:59])
    assert "asof_join" in backlog and "pack_sequences" in backlog


def test_every_graded_entry_is_oracle_paired():
    """Every registry entry (205 as of round 9) — a regression here
    silently downgrades a query to the driver's weaker rows-only
    check."""
    oracles = entrymod.oracle_sql()
    assert set(entrymod.queries()) == set(oracles)
