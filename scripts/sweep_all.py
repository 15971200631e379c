"""One timed noop-sink run of EVERY registry query at $SPARK_GRAFT_SF_DIR —
the coverage sweep behind OPTIMIZATION_r13's per-operator checklist.
Single warm-free pass (ranking, not benchmarking): flags pathological
entries for a closer min-of-N look.

    python scripts/sweep_all.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipeline_last_fm_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sweep_all.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark = get_spark(app_name="sweep-all")
    times: dict[str, float | None] = {}
    for name, fn in qs.items():
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            times[name] = None
            print(f"[sweep] {name}: ERROR {exc}", flush=True)
        print(f"[sweep] {name}: {times[name]}", flush=True)
    with open(out_path, "w") as f:
        json.dump(times, f, indent=1, sort_keys=True)
    ranked = sorted((t, n) for n, t in times.items() if t is not None)[::-1]
    print(json.dumps({"top20": ranked[:20]}))


if __name__ == "__main__":
    main()
