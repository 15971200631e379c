"""Round-7b analytics wave: hand-computed semantic oracles for
token_entropy / rfm_segments / time_weighted_avg / benford_profile /
supplier_concentration (the driver-style DuckDB parity runs separately
in test_oracle_parity.py — these pin the SEMANTICS with values a human
can check)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_pipeline_last_fm_spark.sources.tables import load_table


def test_token_entropy_degenerate_and_uniform(spark):
    from etl_pipeline_last_fm_spark.operators.text import token_entropy

    docs = spark.createDataFrame(
        [
            (1, "a a a a"),          # degenerate: H = 0
            (2, "a b c d"),          # uniform over 4 types: H = ln 4
            (3, "x x y y"),          # two types evenly: H = ln 2
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in token_entropy(docs).collect()}
    assert (got[1].n_tokens, got[1].n_types) == (4, 1)
    assert got[1].entropy_micronats == 0
    # ln(4)*1e6 = 1386294.36 -> floor 1386294; per-type term ln(1)=0.
    assert got[2].entropy_micronats == 1386294
    # ln(2)*1e6 floored = 693147; S = 4*693147 -> H = 1386294 - 693147.
    assert got[3].entropy_micronats == 1386294 - 693147
    # Monotone sanity: repetitive spam scores strictly below uniform.
    assert got[1].entropy_micronats < got[3].entropy_micronats < got[2].entropy_micronats


def test_rfm_segments_hand_tiles(spark):
    from etl_pipeline_last_fm_spark.operators.segments import rfm_segments

    # 5 users, one event each day apart; frequency/monetary ascending
    # with user_id, recency descending (user 5 is most recent).
    rows = []
    eid = 0
    for u in range(1, 6):
        for k in range(u):  # user u has u events
            eid += 1
            rows.append(
                (eid, f"2024-01-{10 + u:02d} 00:00:00", u, float(u), "e")
            )
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r.user_id: r for r in rfm_segments(ev, n_tiles=5).collect()}
    # recency: corpus frontier is user 5's day; user u lags (5-u) days.
    for u in range(1, 6):
        assert got[u].recency_days == 5 - u
        assert got[u].frequency == u
        assert got[u].monetary_cents == u * u * 100
    # tiles with 5 users and 5 tiles are ranks: tile 1 = best.
    for u in range(1, 6):
        assert got[u].r_tile == 6 - u  # most recent (u=5) -> tile 1
        assert got[u].f_tile == 6 - u
        assert got[u].m_tile == 6 - u
        t = 6 - u
        assert got[u].rfm_code == t * 100 + t * 10 + t


def test_time_weighted_avg_hand_example(spark):
    from etl_pipeline_last_fm_spark.operators.segments import (
        time_weighted_avg,
    )

    # User 1: value 1.00 for 3s, then 5.00 for 1s -> twap = (100*3e6 +
    # 500*1e6) div 4e6 = 200 cents. User 2: single event -> no row.
    # User 3: two events at the SAME us -> span 0 -> no row.
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1, 1.0, "e"),
            (2, "2024-01-01 00:00:03", 1, 5.0, "e"),
            (3, "2024-01-01 00:00:04", 1, 9.0, "e"),
            (4, "2024-01-01 00:00:00", 2, 7.0, "e"),
            (5, "2024-01-01 00:00:00", 3, 1.0, "e"),
            (6, "2024-01-01 00:00:00", 3, 2.0, "e"),
        ],
        "event_id long, ts string, user_id long, value double, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r.user_id: r for r in time_weighted_avg(ev).collect()}
    assert set(got) == {1}
    assert (got[1].n_events, got[1].span_us) == (3, 4_000_000)
    assert got[1].twap_cents == 200


def test_benford_profile_complete_and_consistent(spark, sf_dir):
    import __spark_entry__ as m

    rows = {r.digit: r for r in m.q_benford_profile(spark, sf_dir).collect()}
    assert set(rows) == set(range(1, 10))  # complete digit dim
    total_obs = sum(r.n_obs for r in rows.values())
    li = load_table(spark, sf_dir, "lineitem")
    assert total_obs == li.count()
    assert sum(r.exp_ppm for r in rows.values()) == 1_000_000
    for d, r in rows.items():
        assert 0 <= r.obs_ppm <= 1_000_000
        assert r.dev_ppm == r.obs_ppm - r.exp_ppm
        want = math.floor(math.log10(1 + 1 / d) * 1e6 + 0.5)
        assert r.exp_ppm == want


def test_supplier_concentration_bounds_and_monopoly(spark, sf_dir):
    import __spark_entry__ as m

    rows = m.q_supplier_concentration(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.hhi_ppm2 <= 1_000_000_000_000
        # HHI of n equal shares is 1e12/n — the lower bound per nation.
        assert r.hhi_ppm2 >= 1_000_000_000_000 // r.n_suppliers - r.n_suppliers

    # Monopoly check on a crafted two-nation corpus is covered at the
    # operator formula level: one supplier owning a nation's whole
    # revenue gets share_ppm = 1e6 exactly -> hhi 1e12.
    mono = [r for r in rows if r.n_suppliers == 1]
    for r in mono:
        assert r.hhi_ppm2 == 1_000_000_000_000


def test_abc_classification_partitions_and_orders(spark, sf_dir):
    import __spark_entry__ as m

    rows = {r.abc_class: r for r in m.q_abc_classification(spark, sf_dir).collect()}
    assert set(rows) <= {"A", "B", "C"} and "A" in rows
    li = load_table(spark, sf_dir, "lineitem")
    n_parts = li.select("l_partkey").distinct().count()
    assert sum(r.n_parts for r in rows.values()) == n_parts
    # Shares are truncated ppm of a partition: sum in (1e6 - 3, 1e6].
    total_share = sum(r.share_ppm for r in rows.values())
    assert 1_000_000 - 3 < total_share <= 1_000_000
    # Class boundaries: cumulative ordering means avg revenue per part
    # is non-increasing A -> B -> C.
    if "B" in rows and "C" in rows:
        avg = {
            c: rows[c].class_rev4 / rows[c].n_parts for c in ("A", "B", "C")
        }
        assert avg["A"] >= avg["B"] >= avg["C"]


def test_negative_edges_disjoint_canonical_and_salted(spark, sf_dir):
    from etl_pipeline_last_fm_spark.operators.graph import (
        copurchase_edges,
        negative_edges,
    )
    from etl_pipeline_last_fm_spark.registry.round6 import (
        copurchase_1996_order_parts,
    )

    edges = copurchase_edges(
        copurchase_1996_order_parts(spark, sf_dir)
    ).localCheckpoint()
    neg = negative_edges(edges, k=3)
    neg_rows = {(r.a, r.b) for r in neg.collect()}
    assert neg_rows  # non-vacuous
    # Canonical orientation and true disjointness from the edge list.
    assert all(a < b for a, b in neg_rows)
    pos_rows = {(r.a, r.b) for r in edges.collect()}
    assert not (neg_rows & pos_rows)
    # Deterministic: same salt reproduces; a new salt re-draws.
    again = {(r.a, r.b) for r in negative_edges(edges, k=3).collect()}
    assert again == neg_rows
    other = {(r.a, r.b) for r in negative_edges(edges, k=3, salt="s2").collect()}
    assert other != neg_rows
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k >= 1"):
        negative_edges(edges, k=0)
