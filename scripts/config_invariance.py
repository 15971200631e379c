"""Config-invariance sweep (round 9): every registry query must return
the IDENTICAL result under different execution configurations — the
engine-internal complement of the hostile reorder sweep.

Why: at 100 TB the physical plan is not a constant. AQE re-plans stage
boundaries at runtime, shuffle partition counts are tuned per cluster,
and executor counts change the partitioning of every exchange. A query
whose RESULT depends on any of that is nondeterministic in production
even if it passes every fixed-config oracle check. After the round-9
float-sum audit this should hold everywhere by construction (integer
sums are associative; every tie-break is pinned) — this sweep is the
enforcement.

Protocol: one Spark session; each query runs under config A (the
session default: shuffle=32, AQE on) and config B (shuffle=5, AQE off,
broadcast joins disabled) — both runtime-settable confs, so the same
session alternates. Results are canonicalized (sorted rows, sorted
columns, value-normalized) and compared Spark-vs-Spark.

Config B disables broadcast joins deliberately: every broadcast-hash
join degrades to sort-merge, exercising completely different join
physical operators — same answer required.

Usage: python scripts/config_invariance.py [--names a,b,c]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIG_A = {
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": "10485760",
}
CONFIG_B = {
    "spark.sql.shuffle.partitions": "5",
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def main() -> None:
    from etl_pipeline_last_fm_spark.session import get_spark
    import __spark_entry__ as entrymod
    from tests.oracle_utils import canon_rows

    only = None
    if "--names" in sys.argv:
        only = set(sys.argv[sys.argv.index("--names") + 1].split(","))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark(app_name="config-invariance")
    queries = entrymod.queries()

    def run_under(conf: dict, name: str):
        for k, v in conf.items():
            spark.conf.set(k, v)
        return queries[name](spark, sf_dir).toPandas()

    passed, failed, errored = [], {}, {}
    for name in queries:
        if only and name not in only:
            continue
        try:
            a = run_under(CONFIG_A, name)
            b = run_under(CONFIG_B, name)
            if sorted(a.columns) != sorted(b.columns) or len(a) != len(b):
                failed[name] = (
                    f"shape: A {len(a)}x{sorted(a.columns)}"
                    f" vs B {len(b)}x{sorted(b.columns)}"
                )
            else:
                ra, rb = canon_rows(a), canon_rows(b)
                bad = [(x, y) for x, y in zip(ra, rb) if x != y]
                if bad:
                    failed[name] = f"{len(bad)} row diffs; first: {bad[:2]}"[:300]
                else:
                    passed.append(name)
        except Exception as exc:  # noqa: BLE001 — record and continue
            errored[name] = f"{type(exc).__name__}: {exc}"[:300]
        state = (
            "PASS" if name in passed else "FAIL" if name in failed else "ERR"
        )
        print(f"[conf] {name}: {state}", flush=True)

    print(
        json.dumps(
            {
                "sweep": "config_invariance",
                "sf_dir": sf_dir,
                "n_pass": len(passed),
                "n_fail": len(failed),
                "n_err": len(errored),
                "failed": failed,
                "errored": errored,
            }
        )
    )
    sys.exit(0 if not failed and not errored else 1)


if __name__ == "__main__":
    main()
