"""Round-7c operators, each pinned against an independent reference:

- holt_linear == a pure-Python (level, trend) walk with truncating
  division (the recurrence the engines fold in codegen / recursive CTE)
- holt_fold: the maintenance identity holds for ANY ascending time split
  (hypothesis), out-of-order batches raise, and the streaming twin rides
  the single-state versioned-commit protocol (identity, replay no-op,
  raise without commit)
- durbin_watson == the pure-Python integer closed form
- clustering_coefficients == hand-computed values on a known graph
- skyline_2d == the brute-force dominance definition, for EVERY bucket
  width (width is parallelism, never semantics)
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

streams_strategy = st.dictionaries(
    st.integers(1, 4),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(-500, 500)),
        min_size=1,
        max_size=10,
    ),
    min_size=1,
    max_size=4,
)


def _event_rows(streams):
    rows, eid = [], 0
    for uid, evs in sorted(streams.items()):
        t = datetime(2024, 1, 1)
        for gap, cents in evs:
            t = t + timedelta(minutes=gap)
            rows.append((eid, uid, "e", t, cents / 100.0))
            eid += 1
    return rows


def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts timestamp,"
        " value double",
    )


def _trunc_div(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def _py_holt(rows):
    out = {}
    for uid in {r[1] for r in rows}:
        evs = sorted((r for r in rows if r[1] == uid), key=lambda r: (r[3], r[0]))
        lvl = trd = 0
        for e in evs:
            v = round(e[4] * 100)
            l2 = _trunc_div(lvl + trd + v, 2)
            t2 = _trunc_div(l2 - lvl + trd, 2)
            lvl, trd = l2, t2
        out[uid] = (len(evs), lvl, trd, lvl + trd)
    return out


@given(streams=streams_strategy)
@settings(**SETTINGS)
def test_holt_linear_matches_python_reference(spark, streams):
    from etl_pipeline_last_fm_spark.operators.timeseries import holt_linear

    rows = _event_rows(streams)
    got = {
        r["user_id"]: (
            r["n_events"], r["level_cents"], r["trend_cents"],
            r["forecast_cents"],
        )
        for r in holt_linear(_mk_events(spark, rows)).collect()
    }
    assert got == _py_holt(rows)


@given(streams=streams_strategy, cut=st.integers(0, 12))
@settings(**SETTINGS)
def test_holt_fold_maintenance_identity_any_split(spark, streams, cut):
    """Ordered-fold member #6: for ANY ascending time split, the folded
    (level, trend) state presents exactly the one-shot holt_linear —
    including empty slices and the negative-cents path."""
    from etl_pipeline_last_fm_spark.operators.timeseries import (
        holt_linear,
        incremental_holt_batches,
    )

    rows = _event_rows(streams)
    df = _mk_events(spark, rows)
    cut_ts = datetime(2024, 1, 1) + timedelta(minutes=cut)
    batches = [
        df.filter(df.ts < cut_ts.isoformat(sep=" ")),
        df.filter(df.ts >= cut_ts.isoformat(sep=" ")),
    ]
    got = sorted(map(tuple, incremental_holt_batches(batches).collect()))
    want = sorted(map(tuple, holt_linear(df).collect()))
    assert got == want


def _ev(spark, rows):
    """rows: (user_id, event_id, day, value)."""
    return spark.createDataFrame(
        [(u, e, f"2024-01-{d:02d}", v) for u, e, d, v in rows],
        "user_id long, event_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _holt_slices(spark):
    s0 = _ev(spark, [(1, 10, 1, 4.00), (1, 11, 2, 8.00), (2, 20, 3, 6.00)])
    s1 = _ev(spark, [(1, 12, 11, 2.00)])
    s2 = _ev(spark, [(1, 13, 21, 10.00), (2, 21, 22, 2.00), (3, 30, 23, 5.00)])
    return [s0, s1, s2]


def _want_holt(spark, slices):
    from etl_pipeline_last_fm_spark.operators.timeseries import holt_linear

    union = slices[0]
    for s in slices[1:]:
        union = union.unionByName(s)
    return sorted(map(tuple, holt_linear(union).collect()))


def test_holt_fold_out_of_order_raises(spark):
    from etl_pipeline_last_fm_spark.operators.timeseries import holt_fold_batch

    slices = _holt_slices(spark)
    state = holt_fold_batch(None, slices[0]).localCheckpoint()
    stale = _ev(spark, [(1, 9, 1, 99.0)])  # at/before user 1's frontier
    with pytest.raises(Exception, match="out-of-order"):
        holt_fold_batch(state, stale).collect()


def test_holt_stream_fold_identity_replay_and_out_of_order(spark, tmp_path):
    """The Holt twin under the single-state versioned-commit protocol:
    folded state == the one-shot; replays no-op (the recurrence is NOT
    idempotent); an out-of-order batch raises WITHOUT committing, and a
    corrected batch then lands on the pre-violation state."""
    from etl_pipeline_last_fm_spark.operators.timeseries import (
        present_holt_state,
    )
    from etl_pipeline_last_fm_spark.streaming.ivm import (
        holt_fold_stream_batch,
        read_holt_state,
    )

    path = str(tmp_path / "holt")
    slices = _holt_slices(spark)
    holt_fold_stream_batch(slices[0], 0, path)
    holt_fold_stream_batch(slices[0], 0, path)  # replay
    stale = _ev(spark, [(1, 9, 1, 99.0)])
    with pytest.raises(Exception, match="out-of-order"):
        holt_fold_stream_batch(stale, 1, path)
    holt_fold_stream_batch(slices[1], 1, path)  # corrected batch, same bid
    holt_fold_stream_batch(slices[1].limit(0), 2, path)  # empty advances
    holt_fold_stream_batch(slices[2], 3, path)
    holt_fold_stream_batch(slices[2], 3, path)  # replay
    got = sorted(
        map(tuple, present_holt_state(read_holt_state(spark, path)).collect())
    )
    assert got == _want_holt(spark, slices)


def test_holt_fold_bucketed_and_versioned_layouts(spark, tmp_path):
    """The generic state layouts carry the Holt member too: identity vs
    the one-shot through both fold_batches_bucketed (overwrite) and
    fold_batches_versioned (append-only, latest-per-key read)."""
    from etl_pipeline_last_fm_spark.operators.timeseries import (
        fold_batches_bucketed,
        fold_batches_versioned,
        holt_fold_batch,
        present_holt_state,
    )

    spark.sql("DROP TABLE IF EXISTS holt_state_b")
    spark.sql("DROP TABLE IF EXISTS holt_state_v")
    slices = _holt_slices(spark)
    want = _want_holt(spark, slices)
    got_b = sorted(map(tuple, present_holt_state(
        fold_batches_bucketed(
            spark, slices, "holt_state_b", holt_fold_batch, n_buckets=4
        )
    ).collect()))
    assert got_b == want
    got_v = sorted(map(tuple, present_holt_state(
        fold_batches_versioned(
            spark, slices, "holt_state_v", holt_fold_batch, "user_id",
            n_buckets=4,
        )
    ).collect()))
    assert got_v == want


def _py_dw(rows):
    out = {}
    for uid in {r[1] for r in rows}:
        evs = sorted((r for r in rows if r[1] == uid), key=lambda r: (r[3], r[0]))
        y = [round(e[4] * 100) for e in evs]
        n = len(y)
        sd2 = sum((y[i] - y[i - 1]) ** 2 for i in range(1, n))
        den = n * sum(v * v for v in y) - sum(y) ** 2
        dw = _trunc_div(n * sd2 * 1_000_000, den) if den != 0 else None
        out[uid] = (n, dw)
    return out


@given(streams=streams_strategy)
@settings(**SETTINGS)
def test_durbin_watson_matches_python_reference(spark, streams):
    from etl_pipeline_last_fm_spark.operators.timeseries import durbin_watson

    rows = _event_rows(streams)
    got = {
        r["user_id"]: (r["n_events"], r["dw_ppm"])
        for r in durbin_watson(_mk_events(spark, rows)).collect()
    }
    assert got == _py_dw(rows)


def test_clustering_coefficients_hand_graph(spark):
    """Triangle {1,2,3} plus the tail 3-4-5: lcc(1)=lcc(2)=1, lcc(3)=1/3
    (one closed pair of three), lcc(4)=0, node 5 (degree 1) not emitted."""
    from etl_pipeline_last_fm_spark.operators.graph import (
        clustering_coefficients,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)], "a long, b long"
    )
    got = {
        r["node"]: (r["degree"], r["triangles"], r["lcc_ppm"])
        for r in clustering_coefficients(edges).collect()
    }
    assert got == {
        1: (2, 1, 1_000_000),
        2: (2, 1, 1_000_000),
        3: (3, 1, 333_333),
        4: (2, 0, 0),
    }


points_strategy = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 40)),
    min_size=1,
    max_size=30,
)


def _py_skyline(pts):
    keep = []
    for pid, c, g in pts:
        dominated = any(
            qc <= c and qg >= g and (qc < c or qg > g) for _q, qc, qg in pts
        )
        if not dominated:
            keep.append((pid, c, g))
    return sorted(keep)


@given(points=points_strategy, width=st.sampled_from([1, 3, 7, 1000]))
@settings(**SETTINGS)
def test_skyline_matches_bruteforce_for_every_bucket_width(
    spark, points, width
):
    """skyline_2d == the dominance definition, for every bucket width —
    width tunes parallelism, never the frontier. Duplicate (cost, gain)
    points survive together (neither strictly dominates)."""
    from etl_pipeline_last_fm_spark.operators.skyline import skyline_2d

    pts = [(i, c, g) for i, (c, g) in enumerate(points)]
    df = spark.createDataFrame(pts, "id long, cost long, gain long")
    got = sorted(
        map(tuple, skyline_2d(df, "id", "cost", "gain",
                              bucket_width=width).collect())
    )
    assert got == _py_skyline(pts)
