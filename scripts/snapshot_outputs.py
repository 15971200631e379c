"""Snapshot / compare exact query outputs — the A/B safety net for
optimization refactors (OPTIMIZATION r13).

    python scripts/snapshot_outputs.py save /tmp/snap.pkl q1 q2 ...
    python scripts/snapshot_outputs.py check /tmp/snap.pkl

Rows are collected and sorted; comparison is exact (==) on every value,
including float bit-equality via repr. Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipeline_last_fm_spark.session import get_spark  # noqa: E402


def _canon(df) -> tuple[list[str], list[tuple]]:
    cols = df.columns
    rows = [tuple(repr(v) for v in r) for r in df.collect()]
    rows.sort()
    return cols, rows


def main() -> None:
    mode, path, *names = sys.argv[1:]
    sf_dirs = os.environ.get(
        "SPARK_GRAFT_SNAP_SFS", "/root/testdata/sf0.001,/root/testdata/sf0.01"
    ).split(",")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark = get_spark(app_name="snapshot-outputs")
    if mode == "save":
        snap: dict = {}
        for sf_dir in sf_dirs:
            for name in names:
                snap[(sf_dir, name)] = _canon(qs[name](spark, sf_dir))
                print(f"[snap] saved {name} @ {sf_dir}: {len(snap[(sf_dir, name)][1])} rows", flush=True)
        with open(path, "wb") as f:
            pickle.dump(snap, f)
    elif mode == "check":
        with open(path, "rb") as f:
            snap = pickle.load(f)
        bad = []
        for (sf_dir, name), (cols, rows) in snap.items():
            cols2, rows2 = _canon(qs[name](spark, sf_dir))
            ok = cols == cols2 and rows == rows2
            print(f"[snap] {name} @ {sf_dir}: {'OK' if ok else 'MISMATCH'}", flush=True)
            if not ok:
                bad.append((sf_dir, name))
                if cols != cols2:
                    print(f"  cols: {cols} vs {cols2}")
                else:
                    diff = set(rows) ^ set(rows2)
                    print(f"  rows: {len(rows)} vs {len(rows2)}; sym-diff {len(diff)}; sample: {list(diff)[:3]}")
        if bad:
            sys.exit(f"MISMATCH: {bad}")
        print("[snap] all OK")
    else:
        sys.exit("mode must be save|check")


if __name__ == "__main__":
    main()
