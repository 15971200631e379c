"""Focused pins for the round-13 optimization internals.

Each optimization claimed value-identity; these tests make the identity a
regression guard rather than a one-session measurement note:

* the load_table catalog cache must be metadata-only (same schema, same
  rows, no cross-sf_dir collisions, events ts fixup preserved);
* SQL-text double literals must round-trip to the identical bits F.lit
  carries (the whole ANN literal-expression rewrite rests on this);
* PageRank's chunked adjacency must produce identical ranks for ANY chunk
  split (the 100 TB hub-bounding knob cannot perturb values).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF001, SF01


def test_load_table_catalog_cache_is_metadata_only(spark):
    from etl_pipeline_last_fm_spark.sources.tables import load_table

    a = load_table(spark, SF001, "nation")
    b = load_table(spark, SF001, "nation")  # served from the catalog view
    assert a.schema == b.schema
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # Two scale factors in one session must not collide (the keyed view
    # names): row counts differ between SFs for events.
    n1 = load_table(spark, SF001, "events").count()
    n2 = load_table(spark, SF01, "events").count()
    assert n1 != n2
    # The events ts fixup lives inside the view: ts is a (usable)
    # timestamp either way the parquet was written (nanos-long or NTZ).
    ts_type = dict(load_table(spark, SF001, "events").dtypes)["ts"]
    assert "timestamp" in ts_type


def test_load_table_plan_is_still_a_parquet_scan(spark):
    """The view indirection must not change the physical plan: pushdown
    and pruning still reach the parquet scan node."""
    from etl_pipeline_last_fm_spark.sources.tables import load_table

    df = load_table(spark, SF001, "lineitem").filter(
        F.col("l_orderkey") == 1
    ).select("l_orderkey", "l_quantity")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" in plan
    assert "PushedFilters: [" in plan and "l_orderkey" in plan.split(
        "PushedFilters"
    )[1].splitlines()[0]


def test_sql_double_literal_roundtrips_exact_bits(spark):
    """repr(x)+'D' parsed by Spark SQL must equal F.lit(x) bit-for-bit —
    the foundation of the SQL-text ANN expression builders."""
    import math

    from etl_pipeline_last_fm_spark.operators.similarity import _sql_double

    vals = [
        0.1, -0.1, 1.0, -1.0, 2.0 / 3.0, 1e-17, -1e300, 123456.789e-30,
        math.pi, -math.e, 5e-324, 1.7976931348623157e308,
    ]
    row = spark.range(1).select(
        F.array(*[F.lit(v) for v in vals]).alias("lit"),
        F.expr("array(" + ", ".join(_sql_double(v) for v in vals) + ")").alias("txt"),
    ).head()
    assert list(row["lit"]) == list(row["txt"])
    # bit-level, not just ==: repr round-trip on the collected values
    assert [repr(v) for v in row["lit"]] == [repr(v) for v in row["txt"]]


def test_pagerank_ranks_invariant_under_adjacency_chunk_split(spark, monkeypatch):
    """Any _ADJ_CHUNK value must yield identical ranks: every chunk carries
    the full out-degree, so per-edge contributions are unchanged."""
    from etl_pipeline_last_fm_spark.operators import graph

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (3, 1), (4, 1), (4, 2)],
        "src long, dst long",
    )
    base = {
        (r["node"], r["rank_micro"])
        for r in graph.pagerank_micro(edges, n_iter=3).collect()
    }
    monkeypatch.setattr(graph, "_ADJ_CHUNK", 2)
    split = {
        (r["node"], r["rank_micro"])
        for r in graph.pagerank_micro(edges, n_iter=3).collect()
    }
    assert base == split
    wedges = edges.withColumn("w", (F.col("src") + F.col("dst")).cast("long"))
    monkeypatch.setattr(graph, "_ADJ_CHUNK", 65_536)
    wbase = {
        (r["node"], r["rank_micro"])
        for r in graph.pagerank_weighted_micro(wedges, n_iter=3).collect()
    }
    monkeypatch.setattr(graph, "_ADJ_CHUNK", 2)
    wsplit = {
        (r["node"], r["rank_micro"])
        for r in graph.pagerank_weighted_micro(wedges, n_iter=3).collect()
    }
    assert wbase == wsplit
