"""Pin the graded prefix (VERDICT r5 item 9): the driver grades the FIRST
50 queries() entries only, and dict order IS the contract — the membership
assert in __spark_entry__.py cannot catch an accidental reorder that
silently regrades a different window. This list is edited together with
the ordering dict, deliberately, once per rotation."""

from __future__ import annotations

import __spark_entry__ as entrymod

#: Round-9 window: 9 rotation-invariant headliners, the 9 round-8-queue
#: eval-metrics entries earning their first driver rows (the last
#: never-graded entries — this window closes the book: 205/205 cumulative
#: driver coverage), then 32 backfill slots with the longest-unexercised
#: green anchors (the head of the round-8 past-the-cap line: the
#: round-4/5/6 waves from bpe_pair_counts).
GRADED_WINDOW_R9 = [
    "flagship_royalties",
    "pricing_summary",
    "star_join",
    "windowed_top_k",
    "idempotent_append",
    "sessionize",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "sim_bruteforce",
    "roc_auc",
    "streaming_roc_auc",
    "calibration_bins",
    "calibration_ece",
    "pr_curve",
    "isotonic_calibration",
    "label_agreement",
    "mann_kendall",
    "lift_deciles",
    "bpe_pair_counts",
    "vocab_coverage",
    "scd2_as_of",
    "group_split",
    "curation_funnel",
    "quantile_buckets",
    "histogram",
    "chunk_documents",
    "repetition",
    "zorder_key",
    "weighted_sample",
    "mart_incremental",
    "supplier_balance",
    "lm_score",
    "sim_ann_pq",
    "sim_ann_ivf_recall",
    "sim_ann_pq_recall",
    "grouping_sets",
    "kmv_quantiles",
    "dedup_prefix_filter",
    "bloom_prune_join",
    "outlier_mad",
    "kmv_set_ops",
    "dedup_sorted_neighborhood",
    "dedup_snm_multipass",
    "cohort_retention",
    "regional_revenue",
    "shipping_priority",
    "triangle_count",
    "pagerank",
    "kcore",
    "disjunctive_predicates",
]

ROUND8_QUEUE = [
    "roc_auc", "streaming_roc_auc", "calibration_bins", "calibration_ece",
    "pr_curve", "isotonic_calibration", "label_agreement", "mann_kendall",
    "lift_deciles",
]


def test_graded_prefix_is_pinned():
    names = list(entrymod.queries())
    assert names[:50] == GRADED_WINDOW_R9


def test_round8_queue_is_in_window():
    assert len(ROUND8_QUEUE) == 9
    assert set(ROUND8_QUEUE) <= set(GRADED_WINDOW_R9)


def test_headliners_lead_the_window():
    from bench import HEADLINE

    assert set(GRADED_WINDOW_R9[:9]) == set(HEADLINE)


def test_every_graded_entry_is_oracle_paired():
    """Every registry entry (205 as of round 9) — a regression here
    silently downgrades a query to the driver's weaker rows-only
    check."""
    oracles = entrymod.oracle_sql()
    assert set(entrymod.queries()) == set(oracles)
