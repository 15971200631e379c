"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line for the driver.

Times are wall-clock per query over a warmed session (one untimed warmup of a
trivial action to absorb JVM/codegen startup), action = count() over the
query result (forces full execution without driver-side materialization of
wide rows)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_pipeline_last_fm_spark.session import get_spark  # noqa: E402

# Headline set: one per physical-plan family (agg-only, star join+agg,
# window top-k, anti-join, shingle self-join, vector scoring).
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # Warmup: run each headline query once at the smallest SF so JVM JIT,
    # whole-stage-codegen compilation and Catalyst rule caches are hot; the
    # timed runs at the target SF then measure the engine, not the compiler.
    # (Different directory -> parquet data IO at the target SF is NOT warmed.)
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and os.path.abspath(warm_dir) != os.path.abspath(sf_dir):
        for name in HEADLINE:
            qs[name](spark, warm_dir).count()
    else:
        spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
