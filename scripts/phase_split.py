"""Split a query's wall time into build (Python/py4j construction),
plan (analysis+optimization via explain), and execute (noop write).

Usage: python scripts/phase_split.py <query> [more...] [--n N]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipeline_last_fm_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    n = 3
    if "--n" in args:
        i = args.index("--n")
        n = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    names = [a for a in args if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark = get_spark(app_name="phase-split")
    for name in names:
        fn = qs[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        rows = []
        for _ in range(n):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()  # force analysis+optimization
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            rows.append((t1 - t0, t2 - t1, t3 - t2))
        best = min(rows, key=lambda r: sum(r))
        print(
            f"[phase] {name}: build={best[0]:.3f} plan={best[1]:.3f} "
            f"exec={best[2]:.3f} total={sum(best):.3f} "
            f"(all: {[tuple(round(x,3) for x in r) for r in rows]})",
            flush=True,
        )


if __name__ == "__main__":
    main()
