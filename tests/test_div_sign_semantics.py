"""Sign-domain pins for every ``div``-based derived expression (VERDICT
r8 item 5): the audit's two load-bearing facts, verified cross-engine.

1. Spark ``div`` and DuckDB ``//`` BOTH truncate toward zero on signed
   operands — for BIGINT and for the decimal(38,0)/HUGEINT widening
   pair. (Python ``//`` floors, so it is NOT the reference op; the
   ABS+sign devices in the ppm emitters are therefore belt-and-
   suspenders, not correctness-critical.) This is what makes signed
   FINAL divisions — lm_score's negative logprob sums, zipf_fit's
   negative slope numerator, centroid means over signed embedding
   micro-values, attribution's signed credit split — safe without
   per-site guards.

2. Truncating division by a POSITIVE literal width is monotone
   non-decreasing on signed inputs (bucket 0 simply straddles zero), so
   constant-width bucket ids (skyline cost buckets, epoch-µs time
   buckets) are order-safe for any sign; the round-8 rank-device bug
   was a zero/negative DERIVED width, not a monotonicity failure — the
   class the range-shifted ``_range_bucket_expr`` eliminates.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

CASES = [
    (-7, 2), (7, -2), (-7, -2), (7, 2),
    (-1, 3), (1, -3), (-2048, 1024), (-2047, 1024),
    (-1_000_001, 7), (999_999_999_999, -13),
]


def test_spark_div_equals_duckdb_intdiv_on_signed_bigint(spark):
    rows = spark.createDataFrame(CASES, "a long, b long").select(
        F.expr("a div b").alias("q"),
        F.expr(
            "CAST(CAST(a AS DECIMAL(38,0)) div CAST(b AS DECIMAL(38,0))"
            " AS BIGINT)"
        ).alias("qd"),
    ).collect()
    for (a, b), r in zip(CASES, rows):
        want = duckdb.sql(
            f"SELECT {a} // {b},"
            f" CAST(CAST({a} AS HUGEINT) // CAST({b} AS HUGEINT) AS BIGINT)"
        ).fetchone()
        assert (r["q"], r["qd"]) == want, (a, b)
        # and both ARE truncation toward zero (not Python's floor)
        tz = abs(a) // abs(b)
        tz = -tz if (a < 0) != (b < 0) else tz
        assert r["q"] == tz, (a, b)


def test_trunc_div_by_positive_width_is_monotone_on_signed_values(spark):
    """The constant-width bucket-id safety argument: for width > 0,
    v div width is non-decreasing in v across the full signed range, so
    (bucket, value) sorts agree with plain value sorts."""
    vals = list(range(-25, 26)) + [-10**12, -2048, -1024, 10**12]
    df = spark.createDataFrame(
        [(v,) for v in sorted(vals)], "v long"
    ).select("v", F.expr("v div 7").alias("b"))
    rows = df.orderBy("v").collect()
    for lo, hi in zip(rows, rows[1:]):
        assert lo["b"] <= hi["b"], (lo, hi)
