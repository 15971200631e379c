"""One-command round-close certification (VERDICT r9 item 5).

Runs, each in its own fresh process, every certification leg the round-9
close assembled by hand, and emits ONE JSON artifact so the judge's
re-run (and any regression hunt) is a single command:

1. fresh pytest over tests/ (the full suite, hypothesis pins included)
2. the four hostile-parity variants (reorder / dupes / nulls / gauntlet)
   at sf0.001 AND sf0.01
3. the config-invariance sweep, all three profiles (plan / spill /
   speculation) at sf0.001 AND sf0.01
4. the headline-tier 10x scale smoke (bench protocol on the replicated
   sf1x dataset)

Usage:
    python scripts/round_close.py [--out ROUND_CLOSE_rN.json] [--skip leg,...]
    legs: pytest, hostile, config, scale10x
    --sfs a,b  (default /root/testdata/sf0.001,/root/testdata/sf0.01)
    --only substr[,substr...]: run only legs whose name contains a
      substring (e.g. --only config_spill) — for re-certifying a fixed
      leg into a supplemental artifact without re-running the world

Runtime is hours, not minutes (the pytest leg alone is ~35 min; the
hostile legs run 205 oracle pairs x 4 variants x 2 SFs) — run it once at
the round close, not per commit. Every leg's stdout tail and exit code
are recorded; overall "pass" requires every non-skipped leg green.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_leg(name: str, cmd: list[str], env_extra: dict | None = None) -> dict:
    import time

    env = dict(os.environ)
    env.update(env_extra or {})
    print(f"=== [{name}] {' '.join(cmd)}", flush=True)
    t0 = time.perf_counter()
    proc = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True
    )
    duration_s = round(time.perf_counter() - t0, 1)
    tail = "\n".join(proc.stdout.strip().splitlines()[-3:])
    # sweep scripts print a one-line JSON summary last — keep it parsed
    summary = None
    for line in reversed(proc.stdout.strip().splitlines()):
        if line.startswith("{"):
            try:
                summary = json.loads(line)
            except ValueError:
                pass
            break
    result = {
        "rc": proc.returncode,
        "duration_s": duration_s,
        "tail": tail[-2000:],
        "summary": summary,
    }
    if proc.returncode != 0 and not tail:
        result["stderr_tail"] = proc.stderr[-2000:]
    print(f"=== [{name}] rc={proc.returncode} ({duration_s}s)", flush=True)
    return result


def main() -> None:
    out_path = (
        sys.argv[sys.argv.index("--out") + 1]
        if "--out" in sys.argv
        else "ROUND_CLOSE.json"
    )
    skip = (
        set(sys.argv[sys.argv.index("--skip") + 1].split(","))
        if "--skip" in sys.argv
        else set()
    )
    sfs = (
        sys.argv[sys.argv.index("--sfs") + 1].split(",")
        if "--sfs" in sys.argv
        else ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    )
    only = (
        sys.argv[sys.argv.index("--only") + 1].split(",")
        if "--only" in sys.argv
        else None
    )
    py = sys.executable
    legs: dict[str, dict] = {}

    def wanted(leg_name: str) -> bool:
        return only is None or any(s in leg_name for s in only)

    if "pytest" not in skip and wanted("pytest"):
        legs["pytest"] = run_leg(
            "pytest", [py, "-m", "pytest", "tests/", "-q", "--tb=line"]
        )

    if "hostile" not in skip:
        for variant in ("reorder", "dupes", "nulls", "gauntlet"):
            for sf in sfs:
                tag = sf.rstrip("/").rsplit("/", 1)[-1]
                name = f"hostile_{variant}@{tag}"
                if not wanted(name):
                    continue
                legs[name] = run_leg(
                    name,
                    [py, "scripts/hostile_parity.py", variant],
                    {"HOSTILE_SRC_DIR": sf},
                )

    if "config" not in skip:
        for profile in ("plan", "spill", "speculation"):
            for sf in sfs:
                tag = sf.rstrip("/").rsplit("/", 1)[-1]
                name = f"config_{profile}@{tag}"
                if not wanted(name):
                    continue
                legs[name] = run_leg(
                    name,
                    [py, "scripts/config_invariance.py", "--profile", profile],
                    {"SPARK_GRAFT_SF_DIR": sf},
                )

    if "scale10x" not in skip and wanted("scale10x"):
        legs["scale10x"] = run_leg(
            "scale10x", [py, "scripts/headline_scale_smoke.py"]
        )

    ok = all(leg["rc"] == 0 for leg in legs.values())
    artifact = {"pass": ok, "skipped": sorted(skip), "legs": legs}
    with open(os.path.join(REPO, out_path), "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps({"pass": ok, "out": out_path,
                      "n_legs": len(legs),
                      "failed_legs": [k for k, v in legs.items() if v["rc"]]}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
