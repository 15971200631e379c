"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2 plus the
extension operators (dedup / similarity / text analysis). Each callable takes
(spark, sf_dir) and returns a DataFrame.
``oracle_sql()`` — DuckDB-runnable ANSI SQL equivalent for EVERY query:
201/201 oracle-paired (same column names; computed columns aliased on both
sides). The last rows-only entry closed in round 6 — ``sim_ann_ivf`` now
trains its centroids with the relational Lloyd program, so its oracle
replays the training itself (``kmeans_lloyd_cte_sql``); minhash-LSH,
simhash and ANN-LSH are value-checked via portable md5-derived hashes and
seed-deterministic plane literals.

Float-parity strategy (SURVEY.md Appendix A.2/A.3): every derived double is
rounded with the engine-independent floor trick ``floor(x*10^s + 0.5)/10^s``
on BOTH sides, so the integer division produces bit-identical doubles in
Spark and DuckDB regardless of each engine's ROUND tie behavior.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# Self-locate: the driver may load this file by path (importlib from file)
# from any cwd; the engine package lives next to it.
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from pyspark.sql import DataFrame, SparkSession

from etl_pipeline_last_fm_spark.registry import (
    core,
    extras,
    llm,
    round5,
    round6,
    round7,
    round7c,
    round8,
)

SF001 = "/root/testdata/sf0.001"

# One flat name -> callable map; tier modules own the implementations
# (registry/{core,llm,extras,round5}.py — split out in round 5 so window
# rotations stop churning a 3.5k-line file).
_ALL = {
    **core.QUERIES,
    **llm.QUERIES,
    **extras.QUERIES,
    **round5.QUERIES,
    **round6.QUERIES,
    **round7.QUERIES,
    **round7c.QUERIES,
    **round8.QUERIES,
}

# Back-compat: tests and tooling address queries as module attributes
# (__spark_entry__.q_<name>); every registered query keeps that name here.
for _n, _fn in _ALL.items():
    globals()[f"q_{_n}"] = _fn
del _n, _fn


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the royalties mart re-expressed over the TPC-H-ish star
    (reference dags/from_dds_to_dm_pg.py:73-79) — 3-way join + groupBy +
    sum*rate + round + order. Exercises every layer of the engine."""
    return core.q_flagship_royalties(spark, SF001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordering contract: the grading driver checks the FIRST 50 entries only.
    # Round-11 rotation (VERDICT r10 item 4): freshness burn-down of the
    # OLDEST driver rows. After the r10 staleness rotation, 55 entries'
    # newest CORRECTNESS row was r5/r6-vintage; slots 10-50 take all 24
    # r5-vintage entries plus 17 r6-vintage ones (oldest-first, with the
    # surrogate-key pair deliberately included — VERDICT r10 item 1),
    # leaving a 14-entry r6 backlog for round 12. Cumulative driver
    # coverage stays 205/205 (closed in round 9).
    # Demoted entries keep their driver rows and still run in
    # tests/test_oracle_parity.py at sf0.001 every pytest run; they rotate
    # back in if their family loses its in-window representative.
    # The graded prefix is PINNED by tests/test_graded_window.py — edit
    # that list together with this dict, deliberately.
    # Rotation-invariant set (must stay resolvable by name for bench.py
    # and stays in-window as the flagship tier): pricing_summary,
    # flagship_royalties, star_join, windowed_top_k, idempotent_append,
    # dedup_ngram_jaccard, sim_bruteforce, dedup_minhash_lsh, sessionize.
    out = {
        # --- graded window (entries 1-50) ------------------------------
        # flagship tier: the 9 bench headliners (rotation-invariant)
        "flagship_royalties": _ALL["flagship_royalties"],
        "pricing_summary": _ALL["pricing_summary"],
        "star_join": _ALL["star_join"],
        "windowed_top_k": _ALL["windowed_top_k"],
        "idempotent_append": _ALL["idempotent_append"],
        "sessionize": _ALL["sessionize"],
        "dedup_ngram_jaccard": _ALL["dedup_ngram_jaccard"],
        "dedup_minhash_lsh": _ALL["dedup_minhash_lsh"],
        "sim_bruteforce": _ALL["sim_bruteforce"],
        # freshness-rotation tier, slots 10-33 (VERDICT r10 item 4): the
        # 24 r5-vintage entries — the oldest driver rows in the registry
        # (newest CORRECTNESS row r5) — promoted oldest-first so the hard
        # driver signal describes current code for the whole r5 wave.
        "mode_per_group": _ALL["mode_per_group"],
        "relational_division": _ALL["relational_division"],
        "order_distribution": _ALL["order_distribution"],
        "small_qty_revenue": _ALL["small_qty_revenue"],
        "top_volume_orders": _ALL["top_volume_orders"],
        "corpus_drift": _ALL["corpus_drift"],
        "inverted_index": _ALL["inverted_index"],
        "merge_upsert": _ALL["merge_upsert"],
        "set_ops": _ALL["set_ops"],
        "session_transitions": _ALL["session_transitions"],
        "label_centroids": _ALL["label_centroids"],
        "key_skew_profile": _ALL["key_skew_profile"],
        "nation_trade_volume": _ALL["nation_trade_volume"],
        "market_share": _ALL["market_share"],
        "epoch_shuffle": _ALL["epoch_shuffle"],
        "render_packs": _ALL["render_packs"],
        "market_basket": _ALL["market_basket"],
        "sim_ann_ivfpq": _ALL["sim_ann_ivfpq"],
        "sim_ann_ivfpq_residual": _ALL["sim_ann_ivfpq_residual"],
        "label_propagation": _ALL["label_propagation"],
        "bfs_hops": _ALL["bfs_hops"],
        "kmv_expr": _ALL["kmv_expr"],
        "kmeans_train": _ALL["kmeans_train"],
        "sole_late_supplier": _ALL["sole_late_supplier"],
        # slots 34-50: 17 of the 31 r6-vintage entries, oldest-first in
        # the past-the-cap line — with ONE deliberate swap: surrogate_keys
        # replaces outer_join_agg (line position 17) because VERDICT r10
        # item 1 requires re-attested surrogate_keys AND
        # surrogate_keys_incremental driver rows in the round-11 window
        # (build_dds's fact path switched to the distributed twin this
        # round). outer_join_agg heads the r12 backlog instead.
        "priority_promises": _ALL["priority_promises"],
        "important_parts": _ALL["important_parts"],
        "supplier_part_counts": _ALL["supplier_part_counts"],
        "idle_customers": _ALL["idle_customers"],
        "sssp": _ALL["sssp"],
        "event_pattern": _ALL["event_pattern"],
        "incremental_join": _ALL["incremental_join"],
        "streaming_join": _ALL["streaming_join"],
        "order_limit": _ALL["order_limit"],
        "dedup_passages": _ALL["dedup_passages"],
        "cdc_compact": _ALL["cdc_compact"],
        "lang_id": _ALL["lang_id"],
        "snapshot_diff": _ALL["snapshot_diff"],
        "surrogate_keys_incremental": _ALL["surrogate_keys_incremental"],
        "percentiles": _ALL["percentiles"],
        "semi_join": _ALL["semi_join"],
        "surrogate_keys": _ALL["surrogate_keys"],
        # --- past the 50-entry cap ------------------------------------
        # Every entry below has a green driver row on record (205/205
        # cumulative since round 9); all of them run in
        # tests/test_oracle_parity.py at sf0.001 every pytest run.
        # Line order for the round-12 rotation: longest unexercised
        # first — the 14 remaining r6-vintage entries, then the demoted
        # r7/r8/r9 tiers, then the 41 demoted from the round-10 window
        # (most recently graded, last in line).
        # r6-vintage remainder (14 — the r12 freshness backlog):
        "outer_join_agg": _ALL["outer_join_agg"],
        "token_count": _ALL["token_count"],
        "text_fingerprint": _ALL["text_fingerprint"],
        "sim_ann_lsh_multiprobe": _ALL["sim_ann_lsh_multiprobe"],
        "sim_ann_ivf": _ALL["sim_ann_ivf"],
        "dedup_exact": _ALL["dedup_exact"],
        "text_quality": _ALL["text_quality"],
        "pii_scrub": _ALL["pii_scrub"],
        "distinct_project": _ALL["distinct_project"],
        "case_impute": _ALL["case_impute"],
        "union_all": _ALL["union_all"],
        "json_extract": _ALL["json_extract"],
        "mart_daily_appearances": _ALL["mart_daily_appearances"],
        "explode_tokens": _ALL["explode_tokens"],
        # Demoted from the round-7 graded window (non-audit remainder),
        # then round-8, then the 41 demoted from the round-9 window —
        # same relative order as round 10.
        "event_pattern_measures": _ALL["event_pattern_measures"],
        "forecast_revenue": _ALL["forecast_revenue"],
        "top_supplier": _ALL["top_supplier"],
        "returned_revenue": _ALL["returned_revenue"],
        "promo_revenue": _ALL["promo_revenue"],
        "min_cost_supplier": _ALL["min_cost_supplier"],
        "product_profit": _ALL["product_profit"],
        "dominant_suppliers": _ALL["dominant_suppliers"],
        "link_prediction": _ALL["link_prediction"],
        "attribution": _ALL["attribution"],
        "trend_fit": _ALL["trend_fit"],
        "collocations": _ALL["collocations"],
        "session_concurrency": _ALL["session_concurrency"],
        "contingency_chi2": _ALL["contingency_chi2"],
        "hashed_features": _ALL["hashed_features"],
        "lead_lag": _ALL["lead_lag"],
        "range_join": _ALL["range_join"],
        "funnel": _ALL["funnel"],
        "hll_distinct": _ALL["hll_distinct"],
        "dedup_simhash": _ALL["dedup_simhash"],
        "dedup_rolling_fp": _ALL["dedup_rolling_fp"],
        "embedding_cosine_dedup": _ALL["embedding_cosine_dedup"],
        "sim_ann_lsh": _ALL["sim_ann_lsh"],
        "tfidf": _ALL["tfidf"],
        "top_ngrams": _ALL["top_ngrams"],
        "split_assign": _ALL["split_assign"],
        "mixture_sample": _ALL["mixture_sample"],
        "sim_ann_ivf_seeded": _ALL["sim_ann_ivf_seeded"],
        "fuzzy_name_pairs": _ALL["fuzzy_name_pairs"],
        "multimodal_meta": _ALL["multimodal_meta"],
        "asof_join": _ALL["asof_join"],
        "cms_heavy_hitters": _ALL["cms_heavy_hitters"],
        "contamination": _ALL["contamination"],
        "token_budget_sample": _ALL["token_budget_sample"],
        "pack_sequences": _ALL["pack_sequences"],
        "link_prediction_capped": _ALL["link_prediction_capped"],
        "attribution_fold": _ALL["attribution_fold"],
        "streaming_attribution": _ALL["streaming_attribution"],
        "attribution_decay": _ALL["attribution_decay"],
        "attribution_decay_fold": _ALL["attribution_decay_fold"],
        "streaming_attribution_decay": _ALL["streaming_attribution_decay"],
        "lm_score_bigram": _ALL["lm_score_bigram"],
        "token_entropy": _ALL["token_entropy"],
        "benford_profile": _ALL["benford_profile"],
        "supplier_concentration": _ALL["supplier_concentration"],
        "abc_classification": _ALL["abc_classification"],
        "negative_edges": _ALL["negative_edges"],
        "clustering_coefficient": _ALL["clustering_coefficient"],
        "durbin_watson": _ALL["durbin_watson"],
        "survival_km": _ALL["survival_km"],
        "zipf_fit": _ALL["zipf_fit"],
        "bm25_rank": _ALL["bm25_rank"],
        "rank_sum_test": _ALL["rank_sum_test"],
        "scd2_history": _ALL["scd2_history"],
        "expectations": _ALL["expectations"],
        "hll_vocab": _ALL["hll_vocab"],
        "embedding_cosine_pairs": _ALL["embedding_cosine_pairs"],
        "embedding_keep_list": _ALL["embedding_keep_list"],
        "stratified_sample": _ALL["stratified_sample"],
        "roc_auc": _ALL["roc_auc"],
        "streaming_roc_auc": _ALL["streaming_roc_auc"],
        "calibration_bins": _ALL["calibration_bins"],
        "calibration_ece": _ALL["calibration_ece"],
        "pr_curve": _ALL["pr_curve"],
        "isotonic_calibration": _ALL["isotonic_calibration"],
        "label_agreement": _ALL["label_agreement"],
        "mann_kendall": _ALL["mann_kendall"],
        "lift_deciles": _ALL["lift_deciles"],
        "bpe_pair_counts": _ALL["bpe_pair_counts"],
        "vocab_coverage": _ALL["vocab_coverage"],
        "scd2_as_of": _ALL["scd2_as_of"],
        "group_split": _ALL["group_split"],
        "curation_funnel": _ALL["curation_funnel"],
        "quantile_buckets": _ALL["quantile_buckets"],
        "histogram": _ALL["histogram"],
        "chunk_documents": _ALL["chunk_documents"],
        "repetition": _ALL["repetition"],
        "zorder_key": _ALL["zorder_key"],
        "weighted_sample": _ALL["weighted_sample"],
        "mart_incremental": _ALL["mart_incremental"],
        "supplier_balance": _ALL["supplier_balance"],
        "lm_score": _ALL["lm_score"],
        "sim_ann_pq": _ALL["sim_ann_pq"],
        "sim_ann_ivf_recall": _ALL["sim_ann_ivf_recall"],
        "sim_ann_pq_recall": _ALL["sim_ann_pq_recall"],
        "grouping_sets": _ALL["grouping_sets"],
        "kmv_quantiles": _ALL["kmv_quantiles"],
        "dedup_prefix_filter": _ALL["dedup_prefix_filter"],
        "bloom_prune_join": _ALL["bloom_prune_join"],
        "outlier_mad": _ALL["outlier_mad"],
        "kmv_set_ops": _ALL["kmv_set_ops"],
        "dedup_sorted_neighborhood": _ALL["dedup_sorted_neighborhood"],
        "dedup_snm_multipass": _ALL["dedup_snm_multipass"],
        "cohort_retention": _ALL["cohort_retention"],
        "regional_revenue": _ALL["regional_revenue"],
        "shipping_priority": _ALL["shipping_priority"],
        "triangle_count": _ALL["triangle_count"],
        "pagerank": _ALL["pagerank"],
        "kcore": _ALL["kcore"],
        "disjunctive_predicates": _ALL["disjunctive_predicates"],
        # Demoted from the round-10 graded window (41 non-headliner
        # entries): graded most recently, so LAST in line.
        "rank_metrics": _ALL["rank_metrics"],
        "unpivot_metrics": _ALL["unpivot_metrics"],
        "bpe_train": _ALL["bpe_train"],
        "streaming_mart_fold": _ALL["streaming_mart_fold"],
        "mart_daily_avg": _ALL["mart_daily_avg"],
        "salted_agg": _ALL["salted_agg"],
        "cube_agg": _ALL["cube_agg"],
        "pivot_conditional": _ALL["pivot_conditional"],
        "rolling_stats": _ALL["rolling_stats"],
        "scalar_subquery": _ALL["scalar_subquery"],
        "window_analytic": _ALL["window_analytic"],
        "date_partition_agg": _ALL["date_partition_agg"],
        "rollup_agg": _ALL["rollup_agg"],
        "pivot_native": _ALL["pivot_native"],
        "shipmode_priority": _ALL["shipmode_priority"],
        "ema_decay": _ALL["ema_decay"],
        "ema_fold": _ALL["ema_fold"],
        "cusum": _ALL["cusum"],
        "tumbling_window": _ALL["tumbling_window"],
        "dedup_keep_list": _ALL["dedup_keep_list"],
        "streaming_ema": _ALL["streaming_ema"],
        "cusum_fold": _ALL["cusum_fold"],
        "streaming_cusum": _ALL["streaming_cusum"],
        "rfm_segments": _ALL["rfm_segments"],
        "time_weighted_avg": _ALL["time_weighted_avg"],
        "twap_fold": _ALL["twap_fold"],
        "streaming_twap": _ALL["streaming_twap"],
        "holt_smooth": _ALL["holt_smooth"],
        "holt_fold": _ALL["holt_fold"],
        "streaming_holt": _ALL["streaming_holt"],
        "skyline_parts": _ALL["skyline_parts"],
        "revenue_gini": _ALL["revenue_gini"],
        "skyline_fold": _ALL["skyline_fold"],
        "streaming_skyline": _ALL["streaming_skyline"],
        "profile_columns": _ALL["profile_columns"],
        "gapfill_locf": _ALL["gapfill_locf"],
        "hopping_window": _ALL["hopping_window"],
        "session_window_native": _ALL["session_window_native"],
        "table_checksum": _ALL["table_checksum"],
        "pagerank_weighted": _ALL["pagerank_weighted"],
        "except_all": _ALL["except_all"],
    }
    assert set(out) == set(_ALL), (
        sorted(set(out) ^ set(_ALL))  # ordering list and tier modules agree
    )
    return out


def oracle_sql() -> dict[str, str]:
    return {
        **core.oracles(),
        **llm.oracles(),
        **extras.oracles(),
        **round5.oracles(),
        **round6.oracles(),
        **round7.oracles(),
        **round7c.oracles(),
        **round8.oracles(),
    }
