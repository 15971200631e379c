"""Invariants for the packing / SCD2 / group-split / profile operators
(value parity vs DuckDB is covered by test_oracle_parity; these check the
structural properties parity alone can't express)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_pipeline_last_fm_spark.operators.packing import pack_sequences, pair_counts
from etl_pipeline_last_fm_spark.operators.sampling import group_split_assign
from etl_pipeline_last_fm_spark.operators.scd import scd2_history


def test_pack_offsets_contiguous(spark, sf_dir):
    """tok_offset must be the exact exclusive prefix sum in doc_id order:
    each doc starts where the previous one ended."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = pack_sequences(docs, budget=512).orderBy("doc_id").collect()
    expect = 0
    for r in rows:
        assert r["tok_offset"] == expect, r
        assert r["seq_id"] == r["tok_offset"] // 512
        assert r["pos_in_seq"] == r["tok_offset"] % 512
        expect += r["n_tokens"]


def test_pack_two_phase_equals_naive_window(spark, sf_dir):
    """The blocked prefix sum must be bit-equal to the single global window
    regardless of block size (including block_size=1, maximally fragmented)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    naive = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), " ")).cast("long").alias("n_tokens"),
    ).withColumn(
        "tok_offset",
        F.coalesce(
            F.sum("n_tokens").over(
                Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    for bs in (1, 7, 256):
        got = pack_sequences(docs, budget=512, block_size=bs).select(
            "doc_id", "n_tokens", "tok_offset"
        )
        assert got.exceptAll(naive).count() == 0
        assert naive.exceptAll(got).count() == 0


def test_value_ordered_cumsum_invariant_to_bucket_count(spark):
    """The value-ordered two-phase device (VERDICT r7 item 3) must be
    bit-equal to the single global (value desc, tie asc) window for ANY
    n_buckets — including 1 (everything in one bucket) and a count far
    above the distinct-value range. Data deliberately carries ties (same
    value, different tie key), zeros, and a heavy-tailed top value."""
    from etl_pipeline_last_fm_spark.operators.packing import (
        value_ordered_cumsum,
    )

    rows = [
        (1, 1_000_000), (2, 500), (3, 500), (4, 500), (5, 0), (6, 0),
        (7, 123_456), (8, 7), (9, 7), (10, 999_999), (11, 1), (12, 42),
    ]
    df = spark.createDataFrame(rows, "k long, v long")
    naive = df.withColumn(
        "__cum",
        F.sum("v").over(
            Window.orderBy(F.col("v").desc(), F.col("k").asc()).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    want = sorted(map(tuple, naive.collect()))
    for nb in (1, 2, 7, 64, 10_000_000):
        got = sorted(
            map(tuple, value_ordered_cumsum(df, "v", "k", n_buckets=nb)
                .select("k", "v", "__cum").collect())
        )
        assert got == want, nb


def test_value_ordered_row_number_and_exact_ntile(spark):
    """The rank device must equal the global row_number for BOTH sort
    directions at any bucket count, and exact_ntile_expr must equal SQL
    ntile at every (n, k) shape — n < k (row-per-tile), n = k, k ∤ n
    (first r tiles one larger), k | n."""
    from etl_pipeline_last_fm_spark.operators.packing import (
        exact_ntile_expr,
        value_ordered_row_number,
    )

    rows = [
        (1, 1_000_000), (2, 500), (3, 500), (4, 500), (5, 0), (6, 0),
        (7, 123_456), (8, 7), (9, 7), (10, 999_999), (11, 1), (12, 42),
        (13, 42),
    ]
    df = spark.createDataFrame(rows, "k long, v long")
    for ascending in (True, False):
        order = (
            [F.col("v").asc(), F.col("k").asc()]
            if ascending
            else [F.col("v").desc(), F.col("k").asc()]
        )
        naive = df.withColumn(
            "__rn", F.row_number().over(Window.orderBy(*order)).cast("long")
        )
        want = sorted(map(tuple, naive.collect()))
        for nb in (1, 3, 64, 10_000_000):
            got = sorted(
                map(tuple, value_ordered_row_number(
                    df, "v", "k", ascending=ascending, n_buckets=nb
                ).select("k", "v", "__rn").collect())
            )
            assert got == want, (ascending, nb)

    # ntile formula vs Spark's ntile, all boundary shapes
    for n, k in ((3, 5), (5, 5), (13, 5), (12, 4), (1, 7), (100, 7)):
        sub = spark.createDataFrame(
            [(i, i * 13 % 97) for i in range(n)], "k long, v long"
        )
        naive = sub.select(
            "k",
            F.ntile(k).over(
                Window.orderBy(F.col("v").asc(), F.col("k").asc())
            ).cast("int").alias("tile"),
        )
        want = sorted(map(tuple, naive.collect()))
        got = sorted(
            map(tuple, value_ordered_row_number(
                sub, "v", "k", ascending=True, n_buckets=16
            )
            .crossJoin(F.broadcast(sub.agg(F.count(F.lit(1)).alias("__n"))))
            .select("k", exact_ntile_expr("__rn", "__n", k).alias("tile"))
            .collect())
        )
        assert got == want, (n, k)


def test_pair_counts_deterministic_ties(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "b a b a")], "doc_id long, text string"
    )
    rows = pair_counts(docs, top_k=10).orderBy("rnk").collect()
    # pairs: doc1 -> (a b),(b a),(a b); doc2 -> (b a),(a b),(b a)
    assert [(r["pair"], r["n"], r["rnk"]) for r in rows] == [
        ("a b", 3, 1),
        ("b a", 3, 2),
    ]


def test_scd2_intervals_tile(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    hist = scd2_history(orders).collect()
    by_cust: dict = {}
    for r in hist:
        by_cust.setdefault(r["o_custkey"], []).append(r)
    for cust, rows in by_cust.items():
        rows.sort(key=lambda r: r["version"])
        assert [r["version"] for r in rows] == list(range(1, len(rows) + 1))
        # half-open intervals tile: each valid_to is the next valid_from
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to"] == b["valid_from"], cust
            assert a["is_current"] is False
        assert rows[-1]["valid_to"] is None and rows[-1]["is_current"] is True
        # consecutive versions change the attribute (islands are maximal)
        for a, b in zip(rows, rows[1:]):
            assert a["o_orderpriority"] != b["o_orderpriority"], cust


def test_scd2_covers_every_entity(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n_entities = orders.select("o_custkey").distinct().count()
    assert scd2_history(orders).filter("is_current").count() == n_entities


def test_group_split_no_leakage(spark, sf_dir):
    from etl_pipeline_last_fm_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    straddlers = (
        group_split_assign(ev, group_col="user_id")
        .groupBy("user_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter("k > 1")
        .count()
    )
    assert straddlers == 0
    # and the split is genuinely three-way on this corpus
    splits = {
        r["split"]
        for r in group_split_assign(ev, group_col="user_id")
        .select("split")
        .distinct()
        .collect()
    }
    assert splits == {"train", "val", "test"}


def test_scd2_apply_equals_full_rebuild(spark, sf_dir):
    """Incremental apply (current rows + new batch) must reproduce the
    full-log rebuild exactly, across several split points."""
    from etl_pipeline_last_fm_spark.operators.scd import scd2_apply

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    full = scd2_history(orders)
    for pivot in ("1995-01-01", "1997-06-15", "1998-01-01"):
        old = orders.filter(F.date_format("o_orderdate", "yyyy-MM-dd") < pivot)
        new = orders.filter(F.date_format("o_orderdate", "yyyy-MM-dd") >= pivot)
        applied = scd2_apply(scd2_history(old), new)
        assert applied.exceptAll(full).count() == 0, pivot
        assert full.exceptAll(applied).count() == 0, pivot


def test_scd2_apply_empty_batch_is_identity(spark, sf_dir):
    from etl_pipeline_last_fm_spark.operators.scd import scd2_apply

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    hist = scd2_history(orders)
    applied = scd2_apply(hist, orders.limit(0))
    assert applied.exceptAll(hist).count() == 0
    assert hist.exceptAll(applied).count() == 0


def test_chunks_reconstruct_document(spark):
    """Non-overlap parts of consecutive chunks concatenate back to the doc;
    overlap region of chunk i+1 equals the tail of chunk i."""
    from etl_pipeline_last_fm_spark.operators.packing import chunk_documents

    text = " ".join(f"w{i}" for i in range(150))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_documents(docs, chunk_tokens=64, overlap=16).orderBy("chunk_idx").collect()
    toks = text.split(" ")
    assert [r["chunk_start"] for r in rows] == [0, 48, 96]
    for r in rows:
        assert r["chunk_text"].split(" ") == toks[r["chunk_start"]:r["chunk_start"] + 64]
        assert r["n_chunk_tokens"] == len(r["chunk_text"].split(" "))
    # every token position is covered by at least one chunk
    covered = set()
    for r in rows:
        covered.update(range(r["chunk_start"], r["chunk_start"] + r["n_chunk_tokens"]))
    assert covered == set(range(150))


def test_short_doc_yields_single_chunk(spark):
    from etl_pipeline_last_fm_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    rows = chunk_documents(docs, chunk_tokens=64, overlap=16).collect()
    assert len(rows) == 1
    assert rows[0]["chunk_start"] == 0 and rows[0]["n_chunk_tokens"] == 3


def test_histogram_constant_column(spark):
    """min == max must not produce NaN bins (0.0/0.0) — everything lands
    in bin 0 with bin_lo == bin_hi, matching the oracle's CASE guard."""
    from etl_pipeline_last_fm_spark.operators.profile import fixed_width_histogram

    df = spark.createDataFrame([(1, 7.5)] * 10, "id long, v double")
    rows = fixed_width_histogram(df, "v", n_bins=50).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["bin"] == 0 and r["n_rows"] == 10
    assert r["bin_lo"] == 7.5 == r["bin_hi"]


def test_chunk_rejects_negative_overlap(spark):
    import pytest
    from etl_pipeline_last_fm_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=64, overlap=-10)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=64, overlap=64)


def test_rank_devices_signed_domains(spark):
    """Pinned regressions for VERDICT r8 #1: the round-8 bucket width
    ``vmax div n_buckets + 1`` was 0 when max(value) ∈ [−2047, −1024]
    (ANSI DIVIDE_BY_ZERO at the default n_buckets=1024) and NEGATIVE
    when max(value) ≤ −2048, which silently inverted the global order.
    The range-shifted width must make both devices equal their global-
    window definitions on every signed shape, including full-int64
    extremes (the decimal(38,0) subtraction path — vmax − vmin ≈ 2^64
    would overflow BIGINT under ANSI)."""
    from etl_pipeline_last_fm_spark.operators.packing import (
        value_ordered_cumsum,
        value_ordered_row_number,
    )

    shapes = {
        # was DIVIDE_BY_ZERO: vmax = -1200 in [-2047, -1024]
        "divzero": [-1200, -1500, -1500, -2047, -3000, -1300],
        # was inverted order: vmax = -2048 <= -2048
        "inverted": [-2048, -5000, -5000, -2500, -9999, -2048],
        # mixed signs straddling zero
        "mixed": [-5000, -1, 0, 0, 1, 42, -42, 7_000_000, -7_000_000],
        # full-int64 range: exercises the decimal(38,0) width path
        "int64": [-(2**63), 2**63 - 1, 0, -1, 1, 2**62, -(2**62)],
    }
    for name, vals in shapes.items():
        rows = [(i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "k long, v long")
        for ascending in (True, False):
            order = (
                [F.col("v").asc(), F.col("k").asc()]
                if ascending
                else [F.col("v").desc(), F.col("k").asc()]
            )
            want_rn = sorted(
                map(tuple, df.withColumn(
                    "__rn",
                    F.row_number().over(Window.orderBy(*order)).cast("long"),
                ).collect())
            )
            for nb in (1, 3, 1024):
                got = sorted(
                    map(tuple, value_ordered_row_number(
                        df, "v", "k", ascending=ascending, n_buckets=nb
                    ).select("k", "v", "__rn").collect())
                )
                assert got == want_rn, (name, ascending, nb)
        # cumsum on the signed-but-bounded shapes (sum of int64 extremes
        # would itself overflow the naive window, so skip "int64" there)
        if name == "int64":
            continue
        want_cum = sorted(
            map(tuple, df.withColumn(
                "__cum",
                F.sum("v").over(
                    Window.orderBy(
                        F.col("v").desc(), F.col("k").asc()
                    ).rowsBetween(
                        Window.unboundedPreceding, Window.currentRow
                    )
                ),
            ).collect())
        )
        for nb in (1, 3, 1024):
            got = sorted(
                map(tuple, value_ordered_cumsum(
                    df, "v", "k", n_buckets=nb
                ).select("k", "v", "__cum").collect())
            )
            assert got == want_cum, (name, nb)


def test_rank_devices_hypothesis_sweep(spark):
    """Randomized reinforcement of the fixed-row sweeps: for random
    (key, value) multisets (ties guaranteed by a tiny value domain) and
    random bucket counts, both devices must equal their global-window
    definitions, and total_col must equal the row count. The ``base``
    offset shifts the whole multiset into signed territory, covering
    both round-8 failure windows (vmax in [-2047, -1024] and
    vmax <= -2048; VERDICT r8 #1) alongside the original non-negative
    domain."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from etl_pipeline_last_fm_spark.operators.packing import (
        value_ordered_cumsum,
        value_ordered_row_number,
    )

    @given(
        vals=st.lists(st.integers(0, 6), min_size=1, max_size=25),
        base=st.sampled_from([0, -3, -1500, -2500, -1_000_000]),
        nb=st.sampled_from([1, 2, 5, 97, 1024]),
        ascending=st.booleans(),
    )
    @settings(
        max_examples=16,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
        derandomize=True,
    )
    def check(vals, base, nb, ascending):
        rows = [(i, v + base) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "k long, v long")
        # Reference computed in PURE PYTHON (r14, VERDICT r13 item 2 —
        # pytest-budget): the global-window *definition* of both devices
        # is a plain sort + enumerate/prefix-sum, so an in-process oracle
        # is equally exact, independent of Spark (strictly a stronger
        # check than the previous Spark-window reference), and halves the
        # sweep's Spark-job count (~50 s of the suite).
        ordered = sorted(
            rows, key=lambda r: ((r[1] if ascending else -r[1]), r[0])
        )
        want_rn = sorted(
            (k, v, rn) for rn, (k, v) in enumerate(ordered, start=1)
        )
        got = value_ordered_row_number(
            df, "v", "k", ascending=ascending, n_buckets=nb,
            total_col="__n",
        )
        assert sorted(
            map(tuple, got.select("k", "v", "__rn").collect())
        ) == want_rn
        assert got.select("__n").distinct().collect()[0][0] == len(rows)
        if not ascending:
            cum = 0
            cums = []
            for k, v in ordered:
                cum += v
                cums.append((k, v, cum))
            want_cum = sorted(cums)
            assert sorted(
                map(tuple, value_ordered_cumsum(
                    df, "v", "k", n_buckets=nb
                ).select("k", "v", "__cum").collect())
            ) == want_cum

    check()
