"""Attribute dedup_minhash_lsh's bench-protocol cost (VERDICT r4 item 2).

bench.py's protocol is: untimed warm run -> spark.catalog.clearCache() ->
timed noop run. The operator persists two intermediates (the per-doc
signature and the candidate pairs); clearCache() drops BOTH, so the timed
run pays full cache REPOPULATION on top of the query — cost that a
same-session A/B (which keeps the caches warm) never sees.

This script measures, in one session at $SPARK_GRAFT_SF_DIR:
  A. protocol_timed  — warm run, clearCache, timed run (bench.py's number)
  B. warm_cached     — timed re-run WITHOUT clearCache (caches hot; the
                       same-session A/B number)
  C. cold_first      — the very first run of the session (JIT + caches)
Repeats A and B three times and prints one JSON line.

Interpretation: A - B ~= the persisted-intermediate rebuild cost included
in every BENCH_r{N} minhash number. That inclusion is DELIBERATE — a real
scheduled dedup job starts with cold intermediates every day, so the
protocol number is the honest steady-state job cost; B is the
interactive / iterative-session cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipeline_last_fm_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="minhash-ab")

    import __spark_entry__ as entrymod

    fn = entrymod.queries()["dedup_minhash_lsh"]

    def run() -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    cold_first = run()
    protocol, warm = [], []
    for _ in range(3):
        run()  # untimed warm run (bench protocol step 1)
        spark.catalog.clearCache()
        protocol.append(run())  # bench's timed number (cold caches)
        warm.append(run())  # same-session number (hot caches)
    out = {
        "sf_dir": sf_dir,
        "cold_first": cold_first,
        "protocol_timed": protocol,
        "warm_cached": warm,
        "cache_rebuild_cost": round(
            sum(protocol) / len(protocol) - sum(warm) / len(warm), 3
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
