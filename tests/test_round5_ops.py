"""Round-5 fixes: unconditional decimal widening for market-basket lift
(silent int64 wrap with ansi=false was the failure mode), and deterministic
cache release for the PageRank persists."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F


def test_wide_lift_division_parity_spark_decimal_vs_duckdb_hugeint(spark):
    """The lift numerator is computed as decimal(38,0) on the Spark side
    and HUGEINT on the DuckDB side; both must truncate identically, and
    the path must survive a numerator far beyond int64 (support=2000,
    n_orders=1e10 -> numerator 2e19 > 2^63) regardless of ANSI mode."""
    df = spark.range(1).selectExpr(
        "2000L AS support", "10000000000L AS __n",
        "3000000L AS __ca", "4000001L AS __cb",
    )
    got = df.select(
        F.expr(
            "CAST((CAST(support AS DECIMAL(38,0)) * __n * 1000000)"
            " div (CAST(__ca AS DECIMAL(38,0)) * __cb) AS BIGINT)"
        ).alias("lift_ppm")
    ).first()["lift_ppm"]
    want = duckdb.sql(
        "SELECT CAST((CAST(2000 AS HUGEINT) * 10000000000 * 1000000)"
        " // (CAST(3000000 AS HUGEINT) * 4000001) AS BIGINT)"
    ).fetchone()[0]
    assert got == want
    assert got == 1666666  # truncated, not rounded (exact: 1666666.25...)


def test_market_basket_lift_exceeds_int64_numerator(spark):
    """End-to-end guard at the query shape: a numerator that would wrap
    int64 produces the exact truncated quotient, not garbage. (ansi is
    false in the test session — exactly the config where the old int64
    product corrupted silently.)"""
    assert spark.conf.get("spark.sql.ansi.enabled", "false") == "false"
    big = spark.range(1).selectExpr(
        "9000000000L AS support", "9000000000L AS __n",
        "81L AS __ca", "1000000L AS __cb",
    )
    got = big.select(
        F.expr(
            "CAST((CAST(support AS DECIMAL(38,0)) * __n * 1000000)"
            " div (CAST(__ca AS DECIMAL(38,0)) * __cb) AS BIGINT)"
        ).alias("lift_ppm")
    ).first()["lift_ppm"]
    # 9e9 * 9e9 * 1e6 = 8.1e25; / 8.1e7 = 1e18 — fits int64 exactly.
    assert got == 10**18


def test_graph_caches_scope_releases_persists(spark):
    """pagerank_micro(caches=handle) hands back its persisted frames; the
    graph_caches() scope unpersists them on exit (storage level drops to
    NONE), so loops over many graphs cannot accumulate cached RDDs."""
    from etl_pipeline_last_fm_spark.operators.graph import (
        graph_caches,
        pagerank_micro,
        pagerank_weighted_micro,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 3)], "src long, dst long"
    )
    with graph_caches() as handle:
        ranks = pagerank_micro(edges, n_iter=2, caches=handle)
        assert len(handle) == 2
        ranks.collect()
        assert all(df.storageLevel.useMemory for df in handle)
    assert all(not df.storageLevel.useMemory for df in handle) or not handle

    wedges = edges.withColumn("w", F.lit(2).cast("long"))
    with graph_caches() as handle:
        pagerank_weighted_micro(wedges, n_iter=2, caches=handle).collect()
        assert len(handle) == 2
        kept = list(handle)
    assert all(not df.storageLevel.useMemory for df in kept)
