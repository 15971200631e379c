"""Pin the graded prefix (VERDICT r5 item 9): the driver grades the FIRST
50 queries() entries only, and dict order IS the contract — the membership
assert in __spark_entry__.py cannot catch an accidental reorder that
silently regrades a different window. This list is edited together with
the ordering list in __spark_entry__.py, deliberately, once per rotation.
(An import of entrymod.GRADED_WINDOW_R14 would be circular — the pin is an
independent literal copy by design.)"""

from __future__ import annotations

import __spark_entry__ as entrymod

#: Round-14 window (VERDICT r13 item 1): 9 rotation-invariant headliners,
#: the 9-entry r7-vintage freshness backlog, the 7 r13-rewritten operators
#: the r13 driver run never certified (graph + seeded PQ/IVF-PQ family,
#: embedding_cosine_dedup kept in-window), the 5 r14 optimization targets
#: (dedup mid-tier + link_prediction), and the 20 oldest r8-vintage
#: entries. Oldest ungraded driver row after this rotation: r8.
GRADED_WINDOW_R14 = [
    "flagship_royalties",
    "pricing_summary",
    "star_join",
    "windowed_top_k",
    "idempotent_append",
    "sessionize",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "sim_bruteforce",
    "mixture_sample",
    "sim_ann_ivf_seeded",
    "fuzzy_name_pairs",
    "multimodal_meta",
    "asof_join",
    "cms_heavy_hitters",
    "contamination",
    "token_budget_sample",
    "pack_sequences",
    "pagerank",
    "pagerank_weighted",
    "triangle_count",
    "sim_ann_pq",
    "sim_ann_ivfpq",
    "sim_ann_ivfpq_residual",
    "embedding_cosine_dedup",
    "dedup_rolling_fp",
    "dedup_snm_multipass",
    "dedup_keep_list",
    "dedup_prefix_filter",
    "link_prediction",
    "link_prediction_capped",
    "attribution_fold",
    "streaming_attribution",
    "attribution_decay",
    "attribution_decay_fold",
    "streaming_attribution_decay",
    "lm_score_bigram",
    "token_entropy",
    "benford_profile",
    "supplier_concentration",
    "abc_classification",
    "negative_edges",
    "clustering_coefficient",
    "durbin_watson",
    "survival_km",
    "zipf_fit",
    "bm25_rank",
    "rank_sum_test",
    "scd2_history",
    "expectations",
]

#: slots 10-18: the r7-vintage freshness backlog (9 entries)
R7_BACKLOG_TIER = GRADED_WINDOW_R14[9:18]
#: slots 19-25: the r13 rewrites needing driver certification (7 entries)
R13_REWRITE_TIER = GRADED_WINDOW_R14[18:25]
#: slots 26-30: this round's optimization targets (5 entries)
R14_TARGET_TIER = GRADED_WINDOW_R14[25:30]
#: slots 31-50: the r8-vintage freshness tier (20 entries)
R8_VINTAGE_TIER = GRADED_WINDOW_R14[30:50]


def test_graded_prefix_is_pinned():
    names = list(entrymod.queries())
    assert names[:50] == GRADED_WINDOW_R14


def test_freshness_tier_sizes():
    assert len(R7_BACKLOG_TIER) == 9
    assert len(R13_REWRITE_TIER) == 7
    assert len(R14_TARGET_TIER) == 5
    assert len(R8_VINTAGE_TIER) == 20
    assert len(GRADED_WINDOW_R14) == 50
    assert GRADED_WINDOW_R14[9] == "mixture_sample"  # r12 past-cap head
    assert "pagerank" in R13_REWRITE_TIER  # VERDICT r13 item 1
    assert "sim_ann_ivfpq" in R13_REWRITE_TIER
    assert "triangle_count" in R13_REWRITE_TIER


def test_headliners_lead_the_window():
    from bench import HEADLINE

    assert set(GRADED_WINDOW_R14[:9]) == set(HEADLINE)


def test_r15_backlog_heads_the_past_cap_line():
    """The 4 r8-vintage entries left out of this window must head the
    past-the-cap line so the round-15 rotation picks them up first."""
    names = list(entrymod.queries())
    assert names[50] == "hll_vocab"
    backlog = set(names[50:54])
    assert "embedding_cosine_pairs" in backlog and "stratified_sample" in backlog


def test_every_graded_entry_is_oracle_paired():
    """Every registry entry (205 as of round 9) — a regression here
    silently downgrades a query to the driver's weaker rows-only
    check."""
    oracles = entrymod.oracle_sql()
    assert set(entrymod.queries()) == set(oracles)
