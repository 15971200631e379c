"""The 100 TB overflow story, executed: the flagship / pricing integer
programs document "sum as decimal(38,0) first" as the swap once int64
sums could overflow (rev4 sums cross 2^63 around ~10^14 lineitem rows).
This test RUNS that swap at test SF and proves it is value-identical to
the int64 path — the documented migration is a working recipe, not a
comment."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_last_fm_spark.sources.tables import load_table


def _rev4():
    return F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long") * (
        F.lit(100) - F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long")
    )


def test_decimal38_sum_equals_int64_sum(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    a = (
        li.groupBy("l_returnflag")
        .agg(F.sum(_rev4()).alias("s"))
        .collect()
    )
    b = (
        li.groupBy("l_returnflag")
        .agg(F.sum(_rev4().cast("decimal(38,0)")).alias("s"))
        .collect()
    )
    assert {r["l_returnflag"]: int(r["s"]) for r in a} == {
        r["l_returnflag"]: int(r["s"]) for r in b
    }


def test_decimal38_rounding_identity_matches(spark, sf_dir):
    # The pure-integer round identity (2a+b) div (2b) carries over to
    # decimal: same quotients, so the rendered royalties are unchanged.
    li = load_table(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag").agg(
        F.sum(_rev4()).alias("s4"), F.count(F.lit(1)).alias("n")
    )
    as_int = base.select(
        "l_returnflag", F.expr("(2 * s4 + n) div (2 * n)").alias("r")
    ).collect()
    as_dec = base.select(
        "l_returnflag",
        F.expr(
            "CAST((2 * CAST(s4 AS DECIMAL(38,0)) + n) div (2 * n) AS BIGINT)"
        ).alias("r"),
    ).collect()
    assert {r["l_returnflag"]: r["r"] for r in as_int} == {
        r["l_returnflag"]: int(r["r"]) for r in as_dec
    }


def test_decimal38_cross_multiply_threshold_matches(spark, sf_dir):
    """important_parts' HAVING cut is the integer cross-multiplication
    s4 * 10000 > total — the product is the overflow-prone term at scale
    (total rev4 crosses 2^63/10^4 around ~10^10 lineitem rows). The
    documented swap widens the cross-multiply to decimal(38,0); this
    proves the swapped predicate selects the identical part set."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(F.sum(_rev4()).alias("s4"))
    total = per_part.agg(F.sum("s4").alias("t4"))
    base = per_part.crossJoin(F.broadcast(total))
    as_int = sorted(
        r["l_partkey"]
        for r in base.filter(F.col("s4") * F.lit(10_000) > F.col("t4")).collect()
    )
    as_dec = sorted(
        r["l_partkey"]
        for r in base.filter(
            F.expr(
                "CAST(s4 AS DECIMAL(38,0)) * 10000 > CAST(t4 AS DECIMAL(38,0))"
            )
        ).collect()
    )
    assert as_int == as_dec and len(as_int) > 0
