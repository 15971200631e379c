"""Pin the graded prefix (VERDICT r5 item 9): the driver grades the FIRST
50 queries() entries only, and dict order IS the contract — the membership
assert in __spark_entry__.py cannot catch an accidental reorder that
silently regrades a different window. This list is edited together with
the ordering dict, deliberately, once per rotation."""

from __future__ import annotations

import __spark_entry__ as entrymod

#: Round-11 window (VERDICT r10 item 4): 9 rotation-invariant headliners,
#: then the 24 r5-vintage entries (the registry's oldest driver rows),
#: then 17 r6-vintage entries oldest-first — with surrogate_keys swapped
#: in for outer_join_agg so BOTH surrogate-key entries re-attest in the
#: round that switched build_dds's fact path to the distributed variant
#: (VERDICT r10 item 1). Remaining r6 backlog for round 12: 14 entries,
#: outer_join_agg first.
GRADED_WINDOW_R11 = [
    "flagship_royalties",
    "pricing_summary",
    "star_join",
    "windowed_top_k",
    "idempotent_append",
    "sessionize",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "sim_bruteforce",
    "mode_per_group",
    "relational_division",
    "order_distribution",
    "small_qty_revenue",
    "top_volume_orders",
    "corpus_drift",
    "inverted_index",
    "merge_upsert",
    "set_ops",
    "session_transitions",
    "label_centroids",
    "key_skew_profile",
    "nation_trade_volume",
    "market_share",
    "epoch_shuffle",
    "render_packs",
    "market_basket",
    "sim_ann_ivfpq",
    "sim_ann_ivfpq_residual",
    "label_propagation",
    "bfs_hops",
    "kmv_expr",
    "kmeans_train",
    "sole_late_supplier",
    "priority_promises",
    "important_parts",
    "supplier_part_counts",
    "idle_customers",
    "sssp",
    "event_pattern",
    "incremental_join",
    "streaming_join",
    "order_limit",
    "dedup_passages",
    "cdc_compact",
    "lang_id",
    "snapshot_diff",
    "surrogate_keys_incremental",
    "percentiles",
    "semi_join",
    "surrogate_keys",
]

#: slots 10-33: the r5-vintage freshness tier (24 entries)
R5_VINTAGE_TIER = GRADED_WINDOW_R11[9:33]
#: slots 34-50: the r6-vintage freshness tier (17 entries)
R6_VINTAGE_TIER = GRADED_WINDOW_R11[33:50]


def test_graded_prefix_is_pinned():
    names = list(entrymod.queries())
    assert names[:50] == GRADED_WINDOW_R11


def test_freshness_tier_sizes():
    assert len(R5_VINTAGE_TIER) == 24
    assert len(R6_VINTAGE_TIER) == 17
    assert len(GRADED_WINDOW_R11) == 50
    assert "surrogate_keys" in R6_VINTAGE_TIER
    assert "surrogate_keys_incremental" in R6_VINTAGE_TIER


def test_headliners_lead_the_window():
    from bench import HEADLINE

    assert set(GRADED_WINDOW_R11[:9]) == set(HEADLINE)


def test_r12_backlog_heads_the_past_cap_line():
    """The 14 r6-vintage entries left out of this window must head the
    past-the-cap line so the round-12 rotation picks them up first."""
    names = list(entrymod.queries())
    assert names[50] == "outer_join_agg"
    backlog = set(names[50:64])
    assert "explode_tokens" in backlog and "dedup_exact" in backlog


def test_every_graded_entry_is_oracle_paired():
    """Every registry entry (205 as of round 9) — a regression here
    silently downgrades a query to the driver's weaker rows-only
    check."""
    oracles = entrymod.oracle_sql()
    assert set(entrymod.queries()) == set(oracles)
