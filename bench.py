"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line for the driver.

Protocol: steady-state measurement. Each query gets one untimed warm run at
the TARGET scale factor (absorbs JVM JIT, whole-stage-codegen compilation,
AQE plan adaptation and OS page cache for the input files), then
MIN-OF-N timed runs (N = $SPARK_GRAFT_BENCH_N, default 3; recorded as
``n_samples`` in the JSON line). Min, not mean: this host is shared, and a
single-sample artifact moved 1.72x round-over-round from external load
alone (BENCH_r10, disproved by a quiet re-run on identical code — VERDICT
r10 item 3). A real plan regression shifts the minimum; host noise only
widens the spread upward — the same methodology scripts/quiet_sample.py
uses for A/B attribution, promoted here into the driver-facing artifact.
The timed action is a write to the ``noop`` sink — every output row is
fully produced and handed to the data source (unlike ``count()``, where
Catalyst prunes final projection expressions a real consumer would pay for).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_pipeline_last_fm_spark.session import get_spark  # noqa: E402

# Headline set: one per physical-plan family (agg-only, star join+agg,
# window top-k, anti-join, shingle LSH, vector scoring). Rotation-invariant
# since round 1 — the round-over-round comparable.
HEADLINE = [
    "pricing_summary",
    "flagship_royalties",
    "star_join",
    "windowed_top_k",
    "idempotent_append",
    "dedup_ngram_jaccard",
    "sim_bruteforce",
    "dedup_minhash_lsh",
    "sessionize",
]

# Extended tier (VERDICT r5 item 8): one representative per late-round
# plan family the headliners never touch — iterative graph, composed
# IVF+PQ ANN, wedge-join link prediction, relational Lloyd training.
# Reported as a SECOND metric block in the same JSON line, so regressions
# in these tiers become visible round-over-round without disturbing the
# headline_queries_total_sec series.
# r7 slot swap (VERDICT r6 item 9): sole_late_supplier (bench-stable
# decorrelated Q21; its family stays covered by the headline star joins
# and the r7 plan pins) -> link_prediction, the heaviest round-6
# analytics shape (wedge join over the co-purchase graph).
# r8 addition (VERDICT r7 item 4): twap_fold tracks the ordered-fold IVM
# family's protocol cost (3 time-sliced batches, each one key shuffle +
# in-codegen fold, localCheckpoint per round). Like kmeans_train, its
# per-round checkpoints make the warm rerun cover only the post-
# checkpoint tail — COLD is the round-over-round comparable for both;
# warm-to-warm reads apply to pagerank / sim_ann_ivfpq / link_prediction
# (SCALING.md documents which is which).
EXTENDED = [
    "pagerank",
    "sim_ann_ivfpq",
    "link_prediction",
    "kmeans_train",
    "twap_fold",
]


def _run(df) -> None:
    """Force full execution of every output row (noop data source sink)."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # Per-query fault isolation: a single failing query must not abort the
    # loop or suppress the JSON line (r02: one AnalysisException in a warm
    # run produced an empty BENCH file). Failures record an error string in
    # "errors" and a null timing; the JSON line is ALWAYS emitted.
    errors: dict[str, str] = {}

    n_samples = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_N", "3")))

    def timed_run(name: str) -> float:
        """ONE timed execution after a cache drop: any operator-internal
        Spark caches are cleared so the run pays the query's full cost
        (JVM warmup and OS page cache are steady-state; a warm-run
        InMemoryRelation is not — a real scheduled job never starts with
        its intermediates pre-cached). The query is REBUILT each sample,
        so every run repays plan construction like a scheduled job would."""
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        _run(qs[name](spark, sf_dir))
        return time.perf_counter() - t0

    def time_tier(names: list[str]) -> dict[str, float | None]:
        timings: dict[str, float | None] = {}
        for name in names:
            try:
                _run(qs[name](spark, sf_dir))  # untimed warm run at target SF
                timings[name] = round(
                    min(timed_run(name) for _ in range(n_samples)), 3
                )
            except Exception as exc:  # noqa: BLE001 — isolate, record, go on
                timings[name] = None
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
        return timings

    def tier_total(timings: dict[str, float | None]) -> float:
        return round(sum(t for t in timings.values() if t is not None), 3)

    def time_tier_cold_warm(
        names: list[str],
    ) -> tuple[dict[str, float | None], dict[str, float | None]]:
        """Extended-tier protocol (VERDICT r6 item 4): the first timed run
        after the untimed warm-up still pays fixed per-session protocol
        costs that the headliners don't expose — plan construction of the
        literal-heavy ANN queries and per-round job submission (pagerank)
        — because each invocation rebuilds the plan. (r13 phase-split
        correction: the sim_ann_ivfpq cold-warm gap attributed here to
        Janino was ~85% py4j Column construction, since cut ~9x by the
        SQL-text builders — OPTIMIZATION_r13.md; the protocol and the
        series are unchanged.) That cost is FIXED per plan, so it amortizes
        to zero at 100 TB; the round-over-round comparable is the warm
        data term. cold = the r6-comparable number (warm-up, clearCache,
        then build + execute timed). warm = min of two further
        clearCache'd RE-EXECUTIONS of the SAME DataFrame — rebuilding
        the query mints fresh expression IDs, which defeats the codegen
        cache and re-pays Janino/JIT on every run (measured: a rebuilt
        sim_ann_ivfpq 'warm' run costs the same ~11 s as cold; the
        re-executed plan costs ~2.5 s), so plan reuse is what isolates
        the data term a long-lived job pays. Errors-contract: a failure
        ANYWHERE in a query's runs nulls BOTH its series entries (a cold
        number whose warm reruns crashed is not comparable
        round-over-round either)."""
        cold: dict[str, float | None] = {}
        warm: dict[str, float | None] = {}
        for name in names:
            try:
                _run(qs[name](spark, sf_dir))  # untimed warm run
                # min-of-n cold samples: each rebuilds the DataFrame, so
                # every sample repays plan construction + Janino (fresh
                # expression ids defeat the codegen cache) — identical
                # protocol per sample, min drops host noise only.
                colds = []
                df = None
                for _ in range(n_samples):
                    spark.catalog.clearCache()
                    t0 = time.perf_counter()
                    df = qs[name](spark, sf_dir)
                    _run(df)
                    colds.append(time.perf_counter() - t0)
                cold[name] = round(min(colds), 3)
                reruns = []
                for _ in range(max(2, n_samples)):
                    spark.catalog.clearCache()
                    t0 = time.perf_counter()
                    _run(df)
                    reruns.append(time.perf_counter() - t0)
                warm[name] = round(min(reruns), 3)
            except Exception as exc:  # noqa: BLE001 — isolate, record, go on
                cold[name] = None
                warm[name] = None
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
        return cold, warm

    timings = time_tier(HEADLINE)
    ext_cold, ext_warm = time_tier_cold_warm(EXTENDED)
    headline_total = tier_total(timings)  # the 9-query series, r01-stable
    # VERDICT r13 item 8 (additions-only harness change, r14): the two
    # checkpoint-per-round extended entries have warm numbers that cover
    # only the post-checkpoint tail (kmeans_train 0.021 s / twap_fold
    # 0.036 s warm in BENCH_r13), so a cold drift like r13's +29%/+23% on
    # them gets no per-query status ink. Mirror their COLD numbers into
    # the per-query map under *_cold names so the driver's comparison
    # tracks them automatically. They are NOT summed into "value" — the
    # headline total remains the identical 9-query series (computed above,
    # before these keys are added); no existing entry is removed, renamed
    # or re-measured.
    for _n in ("kmeans_train", "twap_fold"):
        if ext_cold.get(_n) is not None:
            timings[f"{_n}_cold"] = ext_cold[_n]
    out = {
        "metric": "headline_queries_total_sec",
        "value": headline_total,
        "unit": "sec",
        "queries": timings,
        "extended_metric": "extended_queries_total_sec",
        "extended_value": tier_total(ext_cold),
        "extended_queries": ext_cold,
        "extended_warm_metric": "extended_queries_warm_total_sec",
        "extended_warm_value": tier_total(ext_warm),
        "extended_queries_warm": ext_warm,
        "n_samples": n_samples,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
