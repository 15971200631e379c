"""bench.py driver-interface contract: one JSON line, required keys, all
headline queries present, crash isolation. Runs bench in a subprocess at
sf0.001 so the contract is exercised exactly the way the driver invokes
it (own process, env-selected SF)."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_emits_one_json_line_with_contract_keys():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env["SPARK_GRAFT_CPUS"] = "4"
    # N=1: the contract under test is the JSON shape and crash isolation,
    # not the timing protocol — min-of-3 (the default since round 11)
    # would triple the subprocess wall for no added contract coverage,
    # and exercising the knob here keeps the env override itself tested.
    env["SPARK_GRAFT_BENCH_N"] = "1"
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True, text=True, timeout=900, env=env, cwd=repo,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    json_lines = [
        l for l in out.stdout.splitlines() if l.startswith("{") and l.endswith("}")
    ]
    assert len(json_lines) == 1, out.stdout[-2000:]
    rec = json.loads(json_lines[0])
    assert rec["metric"] == "headline_queries_total_sec"
    assert rec["unit"] == "sec" and isinstance(rec["value"], (int, float))
    assert rec["sf"] == 0.001
    assert rec["n_samples"] == 1  # the env knob reached the artifact
    import bench

    # r14 (VERDICT r13 item 8): the per-query map carries the 9 headliners
    # plus mirrored *_cold entries for the checkpoint-heavy extended pair;
    # "value" stays the sum of the 9 headliners only.
    assert set(rec["queries"]) == set(bench.HEADLINE) | {
        "kmeans_train_cold",
        "twap_fold_cold",
    }
    assert (
        abs(rec["value"] - sum(rec["queries"][n] for n in bench.HEADLINE))
        < 1e-6
    )
    # Crash isolation contract: every query key maps to a number (no query
    # failed) and, had one failed, it would be null with an errors map —
    # not a missing JSON line.
    assert all(isinstance(v, (int, float)) for v in rec["queries"].values())
    # Extended tier carries cold + warm blocks (VERDICT r6 item 4): the
    # cold series is the r6-comparable number, the warm series is the
    # JIT-settled data term.
    assert set(rec["extended_queries"]) == set(bench.EXTENDED)
    assert set(rec["extended_queries_warm"]) == set(bench.EXTENDED)
    assert rec["extended_warm_metric"] == "extended_queries_warm_total_sec"
    assert all(
        isinstance(v, (int, float)) for v in rec["extended_queries"].values()
    )
    assert all(
        isinstance(v, (int, float))
        for v in rec["extended_queries_warm"].values()
    )
