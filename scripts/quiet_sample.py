"""Same-session quiet-loop sampler — the standing A/B tool for bench
artifact anomalies (VERDICT r9 item 2: any headliner artifact move >1.3x
round-over-round gets a same-session attribution that round).

BENCH_r*.json is a single timed run per query; on this shared host a
single sample moves up to ~1.5x under load (the documented r8/r9 spread).
This script separates signal from noise: one session, per query an
untimed warm run then N clearCache'd timed runs (bench.py's exact timed
action: noop-sink write), reporting min/median/max. A real plan
regression shifts the MINIMUM; host noise widens the spread upward while
the minimum stays put.

Usage:
    python scripts/quiet_sample.py pricing_summary [more...] [--n 7]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipeline_last_fm_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    n = 7
    if "--n" in args:
        i = args.index("--n")
        if i + 1 >= len(args) or not args[i + 1].lstrip("-").isdigit():
            sys.exit("usage: quiet_sample.py <query> [more...] [--n N] — "
                     "'--n' needs an integer value")
        n = int(args[i + 1])
        if n < 1:
            # ADVICE r11: '--n 0' / '--n -3' passed the digit check and
            # blew up as min([]) only after the Spark session started.
            sys.exit("usage: quiet_sample.py <query> [more...] [--n N] — "
                     "N must be >= 1")
        args = args[:i] + args[i + 2 :]
    names = [a for a in args if not a.startswith("--")]
    if not names:
        sys.exit("usage: quiet_sample.py <query> [more...] [--n N]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    unknown = [x for x in names if x not in qs]
    if unknown:
        sys.exit(
            f"unknown query name(s): {', '.join(unknown)}\n"
            f"available: {', '.join(sorted(qs))}"
        )
    spark = get_spark(app_name="quiet-sample")
    out: dict[str, dict] = {}
    for name in names:
        df_factory = qs[name]
        # untimed warm run at target SF (JIT, codegen, page cache)
        df_factory(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(n):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            # rebuild per run, exactly like bench.py's timed_run
            df_factory(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.perf_counter() - t0, 3))
        out[name] = {
            "n": n,
            "min": min(samples),
            "median": round(statistics.median(samples), 3),
            "max": max(samples),
            "samples": samples,
        }
        print(f"[quiet] {name}: {out[name]}", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
