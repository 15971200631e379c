"""Local replica of the driver's DuckDB-oracle comparison.

The driver (TESTDATA.md / __spark_entry__.py contract) runs each Spark query
and its oracle SQL side-by-side and compares row count + schema +
order-insensitive value hash. This module reproduces that check strictly
(exact values after canonicalization) so any parity bug is caught in pytest
before a driver round.
"""

from __future__ import annotations

import math
import os
from typing import Any

import duckdb
import pandas as pd

from etl_pipeline_last_fm_spark.schemas import TESTDATA_TABLES


def duck_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.isdir(path):
            # Spark-written table: a DIRECTORY of part files (the hostile
            # sweep datasets use this layout); glob the parts.
            path = os.path.join(path, "*.parquet")
        elif not os.path.exists(path):
            continue
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).fetchdf()


def _canon_value(v: Any) -> Any:
    """Canonicalize one cell for cross-engine comparison."""
    if v is None:
        return None
    if type(v).__name__ in ("float64", "float32", "int64", "int32", "uint64"):
        v = v.item()  # numpy scalar -> python scalar
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Type-tagged: the driver's value-hash stringifies cells, so an
        # engine pair returning 52 (BIGINT) vs 52.0 (HUGEINT->float64) is a
        # driver FAIL even though 52 == 52.0 in Python. Caught r02's
        # token_budget_sample artifact only after the driver did — mirror it.
        return ("f", v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "isoformat"):  # date / datetime
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_canon_value(x) for x in v)
    return v


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    # itertuples, not per-cell .iloc: .iloc[i][c] costs ~30us per CELL in
    # pandas, which turned the sf0.1 sweeps' million-row frames into
    # ~half-hour canonicalizations (round-10 find: the sf0.1 gauntlet
    # spent 30 min inside ONE query's compare). itertuples is also
    # STRICTER, deliberately (ADVICE r10): .iloc row extraction built a
    # common-dtype Series, upcasting ints to float64 in any frame that
    # also has a float column — so an int column canonicalized as
    # ('f', 3.0) and int-vs-float divergence between engines was MASKED.
    # itertuples preserves per-column dtypes; the int stays an untagged 3,
    # exactly like the driver's type-tagged hash sees it
    # (pinned: tests/test_canon_pins.py mixed int+float frame).
    rows = [
        tuple(_canon_value(v) for v in t)
        for t in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


def assert_matches_oracle(spark_df, oracle: str, sf_dir: str, name: str = "") -> None:
    sp = spark_df.toPandas()
    du = duck_run(oracle, sf_dir)
    assert sorted(sp.columns) == sorted(du.columns), (
        f"{name}: column mismatch spark={sorted(sp.columns)} duck={sorted(du.columns)}"
    )
    assert len(sp) == len(du), f"{name}: row count spark={len(sp)} duck={len(du)}"
    rs, rd = canon_rows(sp), canon_rows(du)
    mismatches = [(a, b) for a, b in zip(rs, rd) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first: {mismatches[:3]}"
