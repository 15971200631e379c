"""Pin the graded prefix (VERDICT r5 item 9): the driver grades the FIRST
50 queries() entries only, and dict order IS the contract — the membership
assert in __spark_entry__.py cannot catch an accidental reorder that
silently regrades a different window. This list is edited together with
the ordering dict, deliberately, once per rotation."""

from __future__ import annotations

import __spark_entry__ as entrymod

#: Round-7 window: 9 rotation-invariant headliners, the 19 round-6-queue
#: entries earning their first driver rows (the last never-graded entries —
#: this window closes the book: 164/164 cumulative driver coverage), then
#: the 22 longest-unexercised green anchors (rest of the round-3 tier).
GRADED_WINDOW_R7 = [
    "flagship_royalties",
    "pricing_summary",
    "star_join",
    "windowed_top_k",
    "idempotent_append",
    "sessionize",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "sim_bruteforce",
    "event_pattern_measures",
    "forecast_revenue",
    "top_supplier",
    "returned_revenue",
    "shipmode_priority",
    "promo_revenue",
    "min_cost_supplier",
    "product_profit",
    "dominant_suppliers",
    "link_prediction",
    "ema_decay",
    "ema_fold",
    "attribution",
    "trend_fit",
    "collocations",
    "session_concurrency",
    "contingency_chi2",
    "cusum",
    "hashed_features",
    "lead_lag",
    "range_join",
    "funnel",
    "hll_distinct",
    "tumbling_window",
    "dedup_simhash",
    "dedup_rolling_fp",
    "embedding_cosine_dedup",
    "sim_ann_lsh",
    "tfidf",
    "top_ngrams",
    "split_assign",
    "mixture_sample",
    "sim_ann_ivf_seeded",
    "fuzzy_name_pairs",
    "multimodal_meta",
    "asof_join",
    "cms_heavy_hitters",
    "dedup_keep_list",
    "contamination",
    "token_budget_sample",
    "pack_sequences",
]

ROUND6_QUEUE = [
    "event_pattern_measures", "forecast_revenue", "top_supplier",
    "returned_revenue", "shipmode_priority", "promo_revenue",
    "min_cost_supplier", "product_profit", "dominant_suppliers",
    "link_prediction", "ema_decay", "ema_fold", "attribution",
    "trend_fit", "collocations", "session_concurrency",
    "contingency_chi2", "cusum", "hashed_features",
]


def test_graded_prefix_is_pinned():
    names = list(entrymod.queries())
    assert names[:50] == GRADED_WINDOW_R7


def test_round6_queue_is_in_window():
    assert set(ROUND6_QUEUE) <= set(GRADED_WINDOW_R7)


def test_headliners_lead_the_window():
    from bench import HEADLINE

    assert set(GRADED_WINDOW_R7[:9]) == set(HEADLINE)


def test_every_graded_entry_is_oracle_paired():
    """145/145 since round 6 (sim_ann_ivf's trained-IVF oracle closed the
    last rows-only entry) — a regression here silently downgrades a query
    to the driver's weaker rows-only check."""
    oracles = entrymod.oracle_sql()
    assert set(entrymod.queries()) == set(oracles)
