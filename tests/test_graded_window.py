"""Pin the graded prefix (VERDICT r5 item 9): the driver grades the FIRST
50 queries() entries only, and dict order IS the contract — the membership
assert in __spark_entry__.py cannot catch an accidental reorder that
silently regrades a different window. This list is edited together with
the ordering dict, deliberately, once per rotation."""

from __future__ import annotations

import __spark_entry__ as entrymod

#: Round-8 window: 9 rotation-invariant headliners, the 32 round-7-queue
#: entries earning their first driver rows (the last never-graded entries —
#: this window closes the book: 196/196 cumulative driver coverage), then
#: 9 backfill slots with the longest-unexercised green anchors (the head
#: of the round-7 past-the-cap line: the round-4 wave from profile_columns).
GRADED_WINDOW_R8 = [
    "flagship_royalties",
    "pricing_summary",
    "star_join",
    "windowed_top_k",
    "idempotent_append",
    "sessionize",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "sim_bruteforce",
    "streaming_ema",
    "link_prediction_capped",
    "cusum_fold",
    "streaming_cusum",
    "attribution_fold",
    "streaming_attribution",
    "attribution_decay",
    "attribution_decay_fold",
    "streaming_attribution_decay",
    "lm_score_bigram",
    "token_entropy",
    "rfm_segments",
    "time_weighted_avg",
    "benford_profile",
    "supplier_concentration",
    "twap_fold",
    "streaming_twap",
    "abc_classification",
    "negative_edges",
    "holt_smooth",
    "holt_fold",
    "streaming_holt",
    "clustering_coefficient",
    "durbin_watson",
    "skyline_parts",
    "survival_km",
    "revenue_gini",
    "zipf_fit",
    "bm25_rank",
    "skyline_fold",
    "streaming_skyline",
    "rank_sum_test",
    "profile_columns",
    "scd2_history",
    "gapfill_locf",
    "expectations",
    "hll_vocab",
    "hopping_window",
    "embedding_cosine_pairs",
    "embedding_keep_list",
    "stratified_sample",
]

ROUND7_QUEUE = [
    "streaming_ema", "link_prediction_capped", "cusum_fold",
    "streaming_cusum", "attribution_fold", "streaming_attribution",
    "attribution_decay", "attribution_decay_fold",
    "streaming_attribution_decay", "lm_score_bigram", "token_entropy",
    "rfm_segments", "time_weighted_avg", "benford_profile",
    "supplier_concentration", "twap_fold", "streaming_twap",
    "abc_classification", "negative_edges", "holt_smooth", "holt_fold",
    "streaming_holt", "clustering_coefficient", "durbin_watson",
    "skyline_parts", "survival_km", "revenue_gini", "zipf_fit",
    "bm25_rank", "skyline_fold", "streaming_skyline", "rank_sum_test",
]


def test_graded_prefix_is_pinned():
    names = list(entrymod.queries())
    assert names[:50] == GRADED_WINDOW_R8


def test_round7_queue_is_in_window():
    assert len(ROUND7_QUEUE) == 32
    assert set(ROUND7_QUEUE) <= set(GRADED_WINDOW_R8)


def test_headliners_lead_the_window():
    from bench import HEADLINE

    assert set(GRADED_WINDOW_R8[:9]) == set(HEADLINE)


def test_every_graded_entry_is_oracle_paired():
    """Every registry entry (202 as of round 8) — a regression here
    silently downgrades a query to the driver's weaker rows-only
    check."""
    oracles = entrymod.oracle_sql()
    assert set(entrymod.queries()) == set(oracles)
