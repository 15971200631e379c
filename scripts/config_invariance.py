"""Config-invariance sweep (round 9, extended round 10): every registry
query must return the IDENTICAL result under different execution
configurations — the engine-internal complement of the hostile reorder
sweep.

Why: at 100 TB the physical plan is not a constant. AQE re-plans stage
boundaries at runtime, shuffle partition counts are tuned per cluster,
and executor counts change the partitioning of every exchange. A query
whose RESULT depends on any of that is nondeterministic in production
even if it passes every fixed-config oracle check. After the round-9
float-sum audit this should hold everywhere by construction (integer
sums are associative; every tie-break is pinned) — this sweep is the
enforcement.

Profiles (``--profile``, default ``plan``):

- ``plan``: config A (session default: shuffle=32, AQE on, broadcast
  joins on) vs config B (shuffle=5, AQE off, broadcast joins DISABLED —
  every broadcast-hash join degrades to sort-merge). Results are
  canonicalized and compared Spark-vs-Spark within one session.
- ``spill``: config A vs config B + forced operator spills: the
  window / sort-merge-join / cartesian buffers spill to disk after a
  few dozen rows (their ``*.buffer.in.memory.threshold`` / ``*.buffer.
  spill.threshold`` SQL confs — see CONFIG_SPILL for why not 1), and
  ObjectHashAggregate falls back to sort-based aggregation after 16
  hash-map entries. This is the memory-starved
  executor reality (VERDICT r9 item 4b): at 100 TB the spill path is
  the COMMON path, and a result that changes when a buffer spills is a
  latent wrong answer no fixed-size fixture run can see.
- ``speculation``: a separate-session axis (``spark.speculation`` is a
  scheduler conf, fixed at SparkContext start): the session runs with
  AGGRESSIVE speculation (quantile 0, multiplier 1.0, 10ms interval —
  nearly every task gets a speculative duplicate attempt) and every
  query is checked against its DuckDB ORACLE, which no Spark config can
  influence. Duplicate task attempts racing to commit must not change
  any result (VERDICT r9 item 4a). Run this profile in its OWN process
  (the script asserts the context picked the conf up).

Usage: python scripts/config_invariance.py [--profile plan|spill|speculation] [--names a,b,c]
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
#: forced-spill deltas on top of CONFIG_B: every buffering operator
#: takes its spill path after a handful of in-memory rows. NOT 1:
#: spill.threshold=1 writes one spill FILE per buffered row, and every
#: spill-file reader allocates a ~1 MB read-ahead buffer
#: (UnsafeSorterSpillReader), so a 60k-row buffer at sf0.001 tried to
#: allocate tens of GB of read-ahead buffers and OOM-killed the JVM —
#: a harness-parameter pathology, not an engine result divergence
#: (round-10 find, documented in SCALING.md). Second find, same class:
#: a sort-merge join RE-READS its buffered group once per left-side
#: rematch, and each re-read allocates fresh 1 MB read-ahead buffers
#: PER SPILL FILE — hot join keys multiply (rematches x files x 1 MB)
#: into an allocation storm that outruns GC. Thresholds below force the
#: spill path on every genuinely large buffer while keeping file counts
#: (and the rematch product) bounded; the spill session also gets a
#: bigger heap (extra_conf at session build).
#: the threshold values live in session.memory_starved_conf() (VERDICT r10
#: item 6: the certified spill profile is a deployable preset, not a
#: harness-only constant) — this sweep layers them on the plan-hostile B.
from etl_pipeline_last_fm_spark.session import memory_starved_conf  # noqa: E402

CONFIG_SPILL = {
    **CONFIG_B,
    **memory_starved_conf(),
}
#: static (context-start) confs for the speculation profile: speculate
#: nearly every task, check results against the DuckDB oracle.
SPECULATION_CONF = {
    "spark.speculation": "true",
    "spark.speculation.quantile": "0.0",
    "spark.speculation.multiplier": "1.0",
    "spark.speculation.interval": "10ms",
}


def _restore(spark, profile_conf: dict) -> None:
    for k in profile_conf:
        if k not in CONFIG_A:
            spark.conf.unset(k)


def main() -> None:
    from etl_pipeline_last_fm_spark.session import get_spark

    only = None
    if "--names" in sys.argv:
        only = set(sys.argv[sys.argv.index("--names") + 1].split(","))
    profile = (
        sys.argv[sys.argv.index("--profile") + 1]
        if "--profile" in sys.argv
        else "plan"
    )
    assert profile in ("plan", "spill", "speculation"), profile
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    if profile == "speculation":
        spark = get_spark(
            app_name="config-invariance-speculation",
            extra_conf=SPECULATION_CONF,
        )
        got = spark.sparkContext.getConf().get("spark.speculation")
        assert got == "true", (
            "spark.speculation is a context-start conf; an existing session "
            f"(spark.speculation={got}) cannot be retrofitted — run this "
            "profile in its own process"
        )
        _run_vs_oracle(spark, sf_dir, only, profile)
        return

    extra = (
        {"spark.driver.memory": os.environ.get("SPILL_DRIVER_MEM", "16g")}
        if profile == "spill"
        else None
    )
    spark = get_spark(app_name=f"config-invariance-{profile}", extra_conf=extra)
    _run_a_vs_b(
        spark, sf_dir, only, profile,
        CONFIG_SPILL if profile == "spill" else CONFIG_B,
    )


def _run_a_vs_b(spark, sf_dir, only, profile, config_b) -> None:
    import __spark_entry__ as entrymod
    from tests.oracle_utils import canon_rows

    queries = entrymod.queries()

    def run_under(conf: dict, name: str):
        for k, v in conf.items():
            spark.conf.set(k, v)
        try:
            return queries[name](spark, sf_dir).toPandas()
        finally:
            _restore(spark, conf)

    passed, failed, errored = [], {}, {}
    for name in queries:
        if only and name not in only:
            continue
        try:
            a = run_under(CONFIG_A, name)
            b = run_under(config_b, name)
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
        print(f"[conf:{profile}] {name}: {state}", flush=True)
    _summarize(profile, sf_dir, passed, failed, errored)


def _run_vs_oracle(spark, sf_dir, only, profile) -> None:
    import __spark_entry__ as entrymod
    from tests.oracle_utils import assert_matches_oracle

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    passed, failed, errored = [], {}, {}
    for name in queries:
        if only and name not in only:
            continue
        try:
            df = queries[name](spark, sf_dir)
            if name in oracles:
                assert_matches_oracle(df, oracles[name], sf_dir, name=name)
            else:
                df.limit(5).collect()
            passed.append(name)
        except AssertionError as exc:
            failed[name] = str(exc)[:300]
        except Exception as exc:  # noqa: BLE001 — record and continue
            errored[name] = f"{type(exc).__name__}: {exc}"[:300]
        state = (
            "PASS" if name in passed else "FAIL" if name in failed else "ERR"
        )
        print(f"[conf:{profile}] {name}: {state}", flush=True)
    _summarize(profile, sf_dir, passed, failed, errored)


def _summarize(profile, sf_dir, passed, failed, errored) -> None:
    print(
        json.dumps(
            {
                "sweep": "config_invariance",
                "profile": profile,
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
