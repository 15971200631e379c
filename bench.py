"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line for the driver.

Protocol: steady-state measurement. Each query gets one untimed warm run at
the TARGET scale factor (absorbs JVM JIT, whole-stage-codegen compilation,
AQE plan adaptation and OS page cache for the input files), then one timed
run. The timed action is a write to the ``noop`` sink — every output row is
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
# IVF+PQ ANN, decorrelated TPC-H Q21, relational Lloyd training. Timed
# with the same warm-then-clearCache protocol and reported as a SECOND
# metric block in the same JSON line, so regressions in these tiers
# become visible round-over-round without disturbing the
# headline_queries_total_sec series.
EXTENDED = [
    "pagerank",
    "sim_ann_ivfpq",
    "sole_late_supplier",
    "kmeans_train",
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

    def time_tier(names: list[str]) -> dict[str, float | None]:
        timings: dict[str, float | None] = {}
        for name in names:
            try:
                _run(qs[name](spark, sf_dir))  # untimed warm run at target SF
                # Drop any operator-internal Spark caches so the timed run
                # pays the query's full cost (JVM warmup and OS page cache
                # are steady-state; a warm-run InMemoryRelation is not — a
                # real scheduled job never starts with its intermediates
                # pre-cached).
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                _run(qs[name](spark, sf_dir))
                timings[name] = round(time.perf_counter() - t0, 3)
            except Exception as exc:  # noqa: BLE001 — isolate, record, go on
                timings[name] = None
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
        return timings

    def tier_total(timings: dict[str, float | None]) -> float:
        return round(sum(t for t in timings.values() if t is not None), 3)

    timings = time_tier(HEADLINE)
    ext_timings = time_tier(EXTENDED)
    out = {
        "metric": "headline_queries_total_sec",
        "value": tier_total(timings),
        "unit": "sec",
        "queries": timings,
        "extended_metric": "extended_queries_total_sec",
        "extended_value": tier_total(ext_timings),
        "extended_queries": ext_timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
