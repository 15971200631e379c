"""Round-4 extension tier: TPC-H plan shapes (Q3/Q5/Q7/Q8/Q13/Q17/Q18),
graph analytics (PageRank/triangles/k-core), set-similarity SNM, MERGE,
checksums, drift, epoch shuffling, market basket. Split out of
__spark_entry__.py in round 5."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_last_fm_spark.functions.scalar import half_up_round, ts_us
from etl_pipeline_last_fm_spark.operators.idempotent import first_writer_wins
from etl_pipeline_last_fm_spark.operators.surrogate import assign_surrogate_keys
from etl_pipeline_last_fm_spark.operators.topk import windowed_top_k
from etl_pipeline_last_fm_spark.operators import asof as asof_oracle_mod
from etl_pipeline_last_fm_spark.operators import cleaning as cleaning_ops
from etl_pipeline_last_fm_spark.operators import fuzzy as fuzzy_ops
from etl_pipeline_last_fm_spark.operators import contamination as contamination_oracle_mod
from etl_pipeline_last_fm_spark.operators import dedup as dedup_ops
from etl_pipeline_last_fm_spark.operators import funnel as funnel_oracle_mod
from etl_pipeline_last_fm_spark.operators import packing as packing_ops
from etl_pipeline_last_fm_spark.operators import profile as profile_ops
from etl_pipeline_last_fm_spark.operators import sampling as sampling_oracle_mod
from etl_pipeline_last_fm_spark.operators import scd as scd_ops
from etl_pipeline_last_fm_spark.operators import timeseries as ts_ops
from etl_pipeline_last_fm_spark.operators import similarity as sim_ops
from etl_pipeline_last_fm_spark.operators import sketch as sketch_ops
from etl_pipeline_last_fm_spark.operators import text as text_ops
from etl_pipeline_last_fm_spark.operators import timewindow as tw_ops
from etl_pipeline_last_fm_spark.operators import zorder as zorder_ops
from etl_pipeline_last_fm_spark.sources.tables import load_table


_US_1996 = 820454400000000  # 1996-01-01T00:00:00Z in epoch microseconds
_US_1997 = 852076800000000  # 1997-01-01T00:00:00Z
_US_DAY = 86_400_000_000  # one day in epoch microseconds


def _rev4_col() -> Column:
    """Exact integer 1e-4-dollar revenue units (see q_flagship_royalties)."""
    return F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long") * (
        F.lit(100) - F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long")
    )


def q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation for EUROPE-region 1996 orders
    where the supplying and ordering nation coincide — the 6-table join
    whose c_nationkey = s_nationkey cross-branch equality makes join
    ORDER matter (customer and supplier branches must meet before the
    nation filter pays off). Exact integer revenue; date bounds as epoch-
    microsecond integers through ts_us (NTZ-safe, the repo's timestamp
    convention)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (ts_us(F.col("o_orderdate")) >= F.lit(_US_1996))
        & (ts_us(F.col("o_orderdate")) < F.lit(_US_1997))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        rev.groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(_rev4_col()).alias("__s4"))
        .select(
            "nation",
            (F.expr("(__s4 + 50) div 100").cast("double") / F.lit(100.0)).alias(
                "revenue"
            ),
        )
        .orderBy(F.col("revenue").desc(), F.col("nation"))
    )


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 unshipped BUILDING-segment orders by
    revenue — selective dim filter + two date inequalities on different
    tables + aggregate + total-order LIMIT (l_orderkey tie-break so the
    top-10 set is engine-deterministic). Exact integer revenue."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        ts_us(F.col("l_shipdate")) > F.lit(_US_1996)
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        ts_us(F.col("o_orderdate")) < F.lit(_US_1996)
    )
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_rev4_col()).alias("__s4"))
        .select(
            "l_orderkey",
            "o_orderdate",
            "o_orderpriority",
            (F.expr("(__s4 + 50) div 100").cast("double") / F.lit(100.0)).alias(
                "revenue"
            ),
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate"), F.col("l_orderkey"))
        .limit(10)
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: distinct users per (first-activity week,
    weeks since) — integer epoch-µs week buckets, no calendar rendering,
    COUNT(DISTINCT) exact (operators/cohort.py; HLL is the documented
    approximate swap at extreme user cardinality)."""
    from etl_pipeline_last_fm_spark.operators.cohort import cohort_retention

    return cohort_retention(load_table(spark, sf_dir, "events"))


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative BPE tokenizer training (6 merges) on a bounded corpus
    sample — the learned merge table. VALUE-CHECKED since round 5: the
    whole training run unrolls into one SQL statement at fixed n_merges
    (packing.bpe_train_oracle_sql — pair-count self-join, argmax with the
    identical tie-break, and the greedy left-to-right rewrite replayed
    relationally by run parity), so the driver hash-compares every merge
    step. Also pinned against a pure-Python greedy reference in
    tests/test_round4_ops.py (including the overlapping-run case), and
    determinism is tested by double-run equality."""
    from etl_pipeline_last_fm_spark.operators.packing import bpe_train

    # Memoized per sf_dir: bpe_train runs EAGERLY (driver-loop iterations,
    # unavoidable for this op), but queries()-enumerating tooling (the
    # plan-shape guard iterates all entries) should not pay the full
    # training job per construction.
    if sf_dir not in _BPE_CACHE:
        docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
        _BPE_CACHE[sf_dir] = bpe_train(docs, n_merges=6)
    return spark.createDataFrame(
        _BPE_CACHE[sf_dir],
        "step int, left string, right string, merged string, pair_count long",
    )


_BPE_CACHE: dict[str, list] = {}


def q_dedup_snm_multipass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-pass sorted-neighborhood: forward + reversed-text sort keys,
    candidates unioned before one shared verification — the classic
    recall repair for pairs differing at the sort key's start (the
    single-pass blindness is demonstrated in
    tests/test_round4_ops.py::test_snm_multipass_catches_head_variant)."""
    from etl_pipeline_last_fm_spark.operators.setsim import (
        sorted_neighborhood_pairs_multipass,
    )

    docs = load_table(spark, sf_dir, "documents")
    return sorted_neighborhood_pairs_multipass(docs, window=10)


def q_dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood blocking (the 4th classic strategy beside
    banding / pigeonhole / prefix): global rank WITHOUT a global sort
    (two-phase range-partition numbering), window-10 candidate equi-join
    with bounded fan-out, exact-Jaccard verification. Recall limited to
    sort-adjacent pairs by design (operators/setsim.py docstring); the
    oracle replicates the window exactly."""
    from etl_pipeline_last_fm_spark.operators.setsim import (
        sorted_neighborhood_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return sorted_neighborhood_pairs(docs, window=10)


_US_1996_07 = 836179200000000  # 1996-07-01T00:00:00Z in epoch microseconds


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 beyond UNION ALL: INTERSECT and EXCEPT (distinct set
    semantics) — customers segmented by when they ordered (both halves of
    1996 / first only / second only). Spark's intersect/subtract lower to
    aggregate + join plans; the oracle uses the SQL set operators
    literally, so the set SEMANTICS (distinctness, NULL handling) are the
    thing cross-checked."""
    orders = load_table(spark, sf_dir, "orders")
    us = ts_us(F.col("o_orderdate"))
    pre = orders.filter((us >= _US_1996) & (us < _US_1996_07)).select("o_custkey")
    post = orders.filter(
        (us >= _US_1996_07) & (us < _US_1997)
    ).select("o_custkey")
    both = pre.intersect(post).select("o_custkey", F.lit("both").alias("segment"))
    only_pre = pre.subtract(post).select("o_custkey", F.lit("h1_only").alias("segment"))
    only_post = post.subtract(pre).select("o_custkey", F.lit("h2_only").alias("segment"))
    return both.unionByName(only_pre).unionByName(only_post)


def q_session_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence mining: the global event-type transition matrix
    (from, to, n) over each user's time-ordered stream — the Markov-chain
    census behind next-action models and funnel diagnostics. One lead()
    window per user (single shuffle on user_id), integer epoch-µs
    ordering with event_id tie-break (NTZ-safe, engine-deterministic)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        ts_us(F.col("ts")), F.col("event_id")
    )
    return (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids in EXACT integer micro-units: each
    component is quantized floor(x*1e6+0.5) BEFORE summation (both
    engines widen the same float32 to the same double, so the quantized
    int64s agree bit-for-bit and the sums are order-free), centroid =
    sum div n. The vector-aggregate pattern (posexplode -> groupBy
    (label, pos)) that cluster-assignment / class-prototype steps use;
    one shuffle, fan-out = dim per row."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos0", "comp"))
        .select(
            "label",
            (F.col("pos0") + 1).alias("pos"),  # 1-based, matches SQL subscripts
            F.floor(F.col("comp").cast("double") * 1e6 + F.lit(0.5))
            .cast("long")
            .alias("q"),
        )
        .groupBy("label", "pos")
        .agg(F.sum("q").alias("__s"), F.count(F.lit(1)).alias("n"))
        .select(
            "label",
            "pos",
            # Spark `div` and DuckDB `//` both truncate toward zero
            # (verified: -7 div 2 = -3 on BOTH) — safe on negative sums.
            F.expr("__s div n").alias("centroid_micro"),
            "n",
        )
    )


def q_sim_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composition — the 100 TB ANN architecture (IVF bounds
    candidates, PQ bounds bytes), seeded so the ENTIRE index is
    SQL-reconstructable and the oracle checks assignment, codes, probes
    and ranks decision-for-decision (operators/similarity.py:
    ivfpq_ann_topk_seeded)."""
    return sim_ops.ivfpq_ann_topk_seeded(load_table(spark, sf_dir, "embeddings"))


def q_sim_ann_ivfpq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESIDUAL IVF-PQ — the FAISS-faithful refinement: codes quantize
    v - centroid(v) (one codebook serves every list), each probe gets its
    own distance tables from q - centroid(probe). Codebooks are
    re-derived RELATIONALLY by the oracle, so even the residual index
    construction is value-checked (operators/similarity.py:
    ivfpq_residual_ann_topk_seeded)."""
    return sim_ops.ivfpq_residual_ann_topk_seeded(
        load_table(spark, sf_dir, "embeddings")
    )


def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-itemset mining, pair tier (the A-priori L2 step): part
    pairs co-occurring in >= min_support orders, with lift in EXACT
    integer ppm — lift = P(ab)/(P(a)P(b)) computed as
    (c_ab * n_orders * 1e6) div (c_a * c_b), integer cross-multiplication
    so no float division at the support/lift boundary. The pair expansion
    is bounded per order by lines-per-order (TPC-H: <= 7) — the same
    linearity argument as the co-supplier graph; the support filter then
    cuts the candidate set before the lift join. A-priori pruning
    (L2 from frequent L1 only) is the documented scale lever: items
    below min_support can't form a frequent pair, so the expansion runs
    on the frequent-item semi-join.

    Overflow: the lift numerator support * n_orders * 1e6 exceeds int64
    already at n_orders ~ 1e10 / support ~ 922, so it is computed as
    decimal(38,0) UNCONDITIONALLY — never int64, never dependent on the
    session's ANSI setting (with ansi=false an int64 product would wrap
    SILENTLY and corrupt every lift). The DuckDB twin widens to HUGEINT
    the same way; decimal `div` truncation == HUGEINT `//` truncation
    (verified in tests/test_round5_ops.py). The QUOTIENT does fit int64
    by construction: support <= min(c_a, c_b), so
    lift_ppm <= n_orders * 1e6 / max(c_a, c_b) <= n_orders * 1e6 —
    ~1e16 at n_orders = 1e10, comfortably inside 2^63."""
    li = load_table(spark, sf_dir, "lineitem")
    min_support = 2
    op = li.select("l_orderkey", "l_partkey").distinct()
    # Lazy scalar (1-row broadcast cross join), NOT a driver .count():
    # registry-enumerating tooling must not pay an eager job here.
    n_orders = op.agg(F.countDistinct("l_orderkey").alias("__n"))
    item = op.groupBy(F.col("l_partkey").alias("p")).agg(
        F.count(F.lit(1)).alias("c")
    )
    # A-priori prune: only items appearing in >= min_support orders can
    # participate in a frequent pair.
    frequent = item.filter(F.col("c") >= min_support)
    opf = op.join(
        frequent.select(F.col("p").alias("l_partkey")), "l_partkey", "left_semi"
    )
    a = opf.alias("a")
    b = opf.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )
    ca = item.select(F.col("p").alias("part_a"), F.col("c").alias("__ca"))
    cb = item.select(F.col("p").alias("part_b"), F.col("c").alias("__cb"))
    return (
        pairs.join(ca, "part_a")
        .join(cb, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "support",
            F.expr(
                "CAST((CAST(support AS DECIMAL(38,0)) * __n * 1000000)"
                " div (CAST(__ca AS DECIMAL(38,0)) * __cb) AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )


def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic between-epoch corpus shuffle: every doc gets a global
    permutation position under a seeded hash order — the 100 TB analogue
    of `random.shuffle` (re-keying the hash seed re-shuffles; same seed
    reproduces the epoch exactly, which is what makes training runs
    resumable). The global numbering uses the two-phase range-partition
    scheme (operators/surrogate.py): the only global step moves one
    integer per partition — no single-partition sort. Hash is the
    portable md5-60bit family so the oracle replays the identical
    permutation."""
    from etl_pipeline_last_fm_spark.functions.scalar import portable_hash60
    from etl_pipeline_last_fm_spark.operators.surrogate import (
        assign_surrogate_keys_distributed,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    keyed = docs.withColumn(
        "__hk", portable_hash60(F.concat(F.lit("epoch1:"), F.col("doc_id").cast("string")))
    )
    return assign_surrogate_keys_distributed(
        keyed, "shuffle_pos", ["__hk", "doc_id"]
    ).select("doc_id", "shuffle_pos")


def q_render_packs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize packed training sequences: docs grouped by the
    `pack_sequences` seq_id assignment, texts concatenated in doc order
    with an EOS separator — the step that turns the offset plan into
    actual model inputs. Deterministic in-group order via array_sort on
    (doc_id, text) structs; one shuffle on seq_id. (A straddling doc
    belongs to the sequence it STARTS in — concat-and-chunk semantics,
    packing.py docstring.)"""
    docs = load_table(spark, sf_dir, "documents")
    assign = packing_ops.pack_sequences(docs, budget=512, block_size=256)
    return (
        docs.join(assign.select("doc_id", "seq_id"), "doc_id")
        .groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                    lambda s: s["text"],
                ),
                "<|eos|>",
            ).alias("packed_text"),
        )
    )


def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the SAME dimension (nation) joined twice under two
    roles — customer nation via orders->customer, supplier nation via
    lineitem->supplier — with a symmetric unordered-pair filter and a
    per-(pair, year) aggregate. Exercises dimension self-join aliasing +
    cross-branch residual predicates. Exact integer revenue; year from
    integer epoch-µs division (NTZ-safe). Pair NATION_19/NATION_18 is
    chosen because BOTH directions are populated at sf0.001 AND sf0.01 —
    the parity check is non-vacuous at every grading scale (verified
    against the fixtures; an empty result would make any join-shape bug
    undetectable)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    pair = (
        (F.col("cust_nation") == "NATION_19") & (F.col("supp_nation") == "NATION_18")
    ) | ((F.col("cust_nation") == "NATION_18") & (F.col("supp_nation") == "NATION_19"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n1), customer.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(n2), supplier.s_nationkey == F.col("s_nk"))
        .filter(pair)
        .withColumn("__us", ts_us(F.col("o_orderdate")))
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.expr("__us div 31557600000000").alias("epoch_year_bucket"),
        )
        .agg(F.sum(_rev4_col()).alias("__s4"))
        .select(
            "cust_nation",
            "supp_nation",
            "epoch_year_bucket",
            (F.expr("(__s4 + 50) div 100").cast("double") / F.lit(100.0)).alias(
                "volume"
            ),
        )
    )


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: a RATIO of conditional aggregates — one nation's
    revenue share of a region's total per year — as sum(CASE)/sum(),
    computed in exact integer ppm via floor division (no float division
    at the parity boundary). Conditional aggregation over a 6-table join.

    Overflow bound: the ppm scaling needs __t4 * 1e6 < 2^63, i.e. a
    per-year-bucket revenue sum below ~9.2e12 rev4-units (~$0.9B) —
    holds through roughly SF10; beyond that cast the sums to
    decimal(38,0) before scaling (the flagship's documented swap,
    executed in tests/test_decimal_swap.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    sn = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    target = F.when(F.col("supp_nation") == "NATION_3", _rev4_col()).otherwise(F.lit(0))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "AMERICA")
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(sn), supplier.s_nationkey == F.col("s_nk"))
        .withColumn("__us", ts_us(F.col("o_orderdate")))
        .groupBy(F.expr("__us div 31557600000000").alias("epoch_year_bucket"))
        .agg(
            F.sum(target).alias("__t4"),
            F.sum(_rev4_col()).alias("__a4"),
        )
        .select(
            "epoch_year_bucket",
            F.expr("(__t4 * 1000000) div __a4").alias("share_ppm"),
        )
    )


def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt) — the inverse of the pivot family (§2.5): the wide
    per-(returnflag, linestatus) aggregate turned into long
    (group, metric, value) rows, the shape BI sinks and metric stores
    ingest. Spark's native DataFrame.unpivot (an Expand node — no
    shuffle, no UDF) against DuckDB's SQL UNPIVOT. Values are exact
    integer counts/sums rendered as int64."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long")
    e2 = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    wide = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).alias("sum_qty"),
        F.sum(e2).alias("sum_price_cents"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return wide.unpivot(
        ids=["l_returnflag", "l_linestatus"],
        values=["sum_qty", "sum_price_cents", "n_rows"],
        variableColumnName="metric",
        valueColumnName="value",
        # an absent metric (all-NULL measure in the group) emits no row —
        # SQL UNPIVOT's standard null-exclusion; Spark's unpivot keeps
        # NULL cells, so pin the long-form contract explicitly (round-9
        # hostile nulls sweep)
    ).where(F.col("value").isNotNull())


def q_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic — the census run BEFORE choosing a salted
    vs plain shuffle plan (operators/skew.py is the mitigation; this is
    the detector): per candidate key column, distinct key count, total
    rows, the heaviest key's row count, and its share in exact ppm
    (integer cross-multiplication, no float division). One groupBy per
    key at full parallelism; the per-key census never leaves the
    executors (max/sum re-aggregate)."""
    li = load_table(spark, sf_dir, "lineitem")

    def profile(col: str) -> DataFrame:
        per_key = li.groupBy(F.col(col).alias("__k")).agg(
            F.count(F.lit(1)).alias("__n")
        )
        return per_key.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("__n").alias("n_rows"),
            F.max("__n").alias("max_key_rows"),
        ).select(
            F.lit(col).alias("key_col"),
            "n_keys",
            "n_rows",
            "max_key_rows",
            F.expr("(max_key_rows * 1000000) div n_rows").alias("top_share_ppm"),
        )

    return (
        profile("l_orderkey")
        .unionByName(profile("l_partkey"))
        .unionByName(profile("l_suppkey"))
        .unionByName(profile("l_returnflag"))
    )


def q_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-shard drift: EXACT total-variation distance between
    token unigram distributions in integer micro-units — the mixture
    health check before training. Pure rational of the token counts (no
    ln(), unlike KL), shared-vocabulary collapse so one inner join per
    pair, pair expansion over the tiny SOURCE dimension only
    (operators/text.py:corpus_drift)."""
    return text_ops.corpus_drift(load_table(spark, sf_dir, "documents"))


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list build: per term its df, total tf, and the sorted
    doc-id posting list (comma-joined so the value hash covers list
    CONTENT, not array formatting). The retrieval primitive behind
    contamination audits and BM25 (operators/text.py:inverted_index)."""
    return text_ops.inverted_index(load_table(spark, sf_dir, "documents"))


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI MERGE INTO semantics (update + insert + delete in one pass)
    over the event log — the general upsert whose insert-only special
    case is the reference's ON CONFLICT DO NOTHING (SURVEY §2.7). Two
    per-key compactions + full-outer + CASE, all shuffling on user_id
    (operators/scd.py:merge_upsert)."""
    return scd_ops.merge_upsert(load_table(spark, sf_dir, "events"))


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation over the co-supplier graph
    (suppliers appearing in the same order), via DEGREE-ORDERED
    orientation — the curse-of-the-last-reducer fix that bounds the wedge
    join's fan-out at O(sqrt(m)) per node on any degree distribution. The
    oracle derives the identical counts through the naive id-ordered
    3-way join: two independent algorithms agreeing node-for-node.
    (Small-SF caveat, operators/graph.py: tiny supplier cardinality makes
    this graph near-complete — density is a fixture artifact, not a plan
    property; production co-occurrence graphs are sparse.)"""
    from etl_pipeline_last_fm_spark.operators.graph import (
        cosupplier_edges,
        triangle_counts,
    )

    return triangle_counts(cosupplier_edges(load_table(spark, sf_dir, "lineitem")))


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-4-iteration PageRank in EXACT integer micro-units over the
    customer->supplier purchase graph: every step is int64 floor division
    and summation, so the ranks match the oracle's 4 unrolled CTEs
    value-for-value by construction — an ITERATIVE algorithm with full
    hash-level cross-engine parity (unlike float PageRank, whose
    accumulation order drifts; and unlike k-means/BPE, whose data-driven
    control flow forces rows-only grading). Pregel shape: one join + one
    shuffle per round, ranks stay (node, int64)."""
    from etl_pipeline_last_fm_spark.operators.graph import (
        customer_supplier_edges,
        pagerank_micro,
    )

    edges = customer_supplier_edges(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )
    return pagerank_micro(edges, n_iter=4)


def q_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational DIVISION — the FOR-ALL quantifier (Codd's ÷), the one
    classic algebra operator no other entry exercises: customers with at
    least one order in EVERY year of a four-year span. SQL has no
    ALL-join, so both engines express it the standard way: per-customer
    count of DISTINCT satisfied buckets == divisor cardinality. Years
    are integer epoch-µs bucket arithmetic (NTZ-safe); the divisor
    cardinality (4) is a literal, not a data-dependent scalar."""
    orders = load_table(spark, sf_dir, "orders")
    # Divisor = four consecutive epoch-year buckets (25..28, the
    # fixture's densest span — verified non-vacuous at sf0.001 AND
    # sf0.01: 60/565 qualifying customers). Integer epoch-µs year
    # arithmetic, same bucket family as market_share.
    return (
        orders.withColumn("__us", ts_us(F.col("o_orderdate")))
        .withColumn("__y", F.expr("__us div 31557600000000"))
        .filter((F.col("__y") >= 25) & (F.col("__y") <= 28))
        .groupBy("o_custkey")
        .agg(F.countDistinct("__y").alias("__ny"))
        .filter(F.col("__ny") == 4)
        .select("o_custkey", F.col("__ny").cast("long").alias("years"))
    )


def q_rank_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 completion: percent_rank and cume_dist — the two analytic
    rank ratios not covered by rank/dense_rank/ntile elsewhere. Both are
    exact rationals of integer ranks ((rk-1)/(n-1), cum/n); each engine
    divides the same int64s, so the doubles agree bit-for-bit without a
    rounding pin. Keyed per customer over order totals (cents).

    Unpriced (NULL-total) orders cannot be ranked by total and are
    excluded explicitly on both engines — left implicit, the engines'
    DEFAULT null sort order diverges (Spark asc = NULLS FIRST, DuckDB
    = NULLS LAST), shifting every rank in the partition (round-9
    hostile nulls sweep)."""
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice").isNotNull()
    )
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    w = Window.partitionBy("o_custkey").orderBy(cents, F.col("o_orderkey"))
    return orders.select(
        "o_custkey",
        "o_orderkey",
        cents.alias("total_cents"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10's BAG-semantics complement to `set_ops`: EXCEPT ALL keeps
    multiplicity (a value occurring 5 times minus 3 occurrences leaves
    2 rows — DISTINCT-based EXCEPT would leave 0). Spark's exceptAll
    lowers to the sum-of-signed-counts generate plan; DuckDB spells
    EXCEPT ALL literally — the multiset semantics are what is
    cross-checked. Quantity values of first-half-1996 lineitems minus
    second-half occurrences."""
    li = load_table(spark, sf_dir, "lineitem")
    us = ts_us(F.col("l_shipdate"))
    qty = F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long")
    h1 = li.filter((us >= _US_1996) & (us < _US_1996_07)).select(qty.alias("qty"))
    h2 = li.filter((us >= _US_1996_07) & (us < _US_1997)).select(qty.alias("qty"))
    return h1.exceptAll(h2)


def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group MODE with a deterministic tie-break: the most frequent
    quantity per return flag (count desc, then smallest value). The
    two-level aggregate shape (census -> per-group argmax) every
    categorical profiler needs; expressed as a rank-1 window over the
    census, never a collect."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long")
    census = li.groupBy(F.col("l_returnflag").alias("flag"), qty.alias("qty")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("flag").orderBy(F.col("cnt").desc(), F.col("qty"))
    return (
        census.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("flag", F.col("qty").alias("mode_qty"), F.col("cnt").alias("n"))
    )


def q_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (rank splits across out-edges proportionally to
    integer order-count weights) in exact integer micro-units — same
    unrolled-oracle discipline as `pagerank`, now with per-edge
    multiplication inside the floor division
    (operators/graph.py:pagerank_weighted_micro)."""
    from etl_pipeline_last_fm_spark.operators.graph import (
        customer_supplier_weighted_edges,
        pagerank_weighted_micro,
    )

    edges = customer_supplier_weighted_edges(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )
    return pagerank_weighted_micro(edges, n_iter=4)


def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy table checksum — the 100 TB replica-validation tool:
    each row's canonical content string hashes to a 60-bit integer
    (portable md5 family), rows bucket by hash range, and each bucket
    reports (n_rows, additive checksum). Comparing two copies of a table
    is then a 64-row diff; a mismatched bucket pinpoints where to drill
    down — no full-table compare, no ordering assumption (the checksum
    is an order-free SUM). The sum accumulates as decimal(38,0) and is
    folded mod 2^61 at the end — overflow-free to ~10^20 rows per bucket
    (decimal(38,0) capacity ~1e38 over 2^60-max hashes ~1.15e18), exact
    on both engines (HUGEINT on DuckDB). Row rendering uses the exact cent
    integers, never float formatting."""
    from etl_pipeline_last_fm_spark.functions.scalar import portable_hash60

    li = load_table(spark, sf_dir, "lineitem")
    qty = F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long")
    e2 = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    d2 = F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long")
    row_str = F.concat_ws(
        "|",
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        qty,
        e2,
        d2,
        F.col("l_returnflag"),
        F.col("l_linestatus"),
    )
    h = portable_hash60(row_str)
    # ONE definition of the bucket/checksum aggregation, shared with the
    # streaming fold (streaming/drift.checksum_state) so the incremental
    # 64-row summary can never drift from the batch/oracle layout.
    from etl_pipeline_last_fm_spark.streaming.drift import checksum_state

    return checksum_state(li.select(h.alias("__h")))


def q_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate spanning
    BOTH join sides (brand/size from part AND quantity from lineitem in
    each disjunct) — the shape that exercises CNF extraction: Catalyst
    must derive the common join key + pushable per-side conjuncts from
    the disjunction instead of evaluating it post-join row by row. Exact
    integer revenue; one row out."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    qty = F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long")
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & (F.col("p_size").between(1, 15))
            & (qty >= 1)
            & (qty <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & (F.col("p_size").between(1, 25))
            & (qty >= 10)
            & (qty <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & (F.col("p_size").between(1, 35))
            & (qty >= 20)
            & (qty <= 30)
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(clause)
        .agg(F.sum(_rev4_col()).alias("__s4"))
        .select(
            (F.expr("(coalesce(__s4, 0L) + 50) div 100").cast("double") / F.lit(100.0))
            .alias("revenue")
        )
    )


def q_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window (dynamic gap-merged windows inside
    the aggregation operator — §2.11's batch form of what Structured
    Streaming runs stateful) against a gaps-and-islands oracle: the same
    30-minute-gap sessions derived two completely different ways. Window
    bounds are surfaced as integer epoch-µs (NTZ-safe), values as exact
    counts + integer cent sums."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 100 + F.lit(0.5)).cast(
        "long"
    )
    return (
        ev.groupBy(
            "user_id", F.session_window(F.col("ts").cast("timestamp"), "30 minutes")
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(cents).alias("sum_cents"))
        .select(
            "user_id",
            ts_us(F.col("session_window.start")).alias("start_us"),
            # session_window.end = last event + gap (exclusive bound)
            ts_us(F.col("session_window.end")).alias("end_us"),
            "n_events",
            "sum_cents",
        )
    )


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-4-round k-core peeling (k=3) over the co-supplier graph —
    the community-density filter, unrolled like pagerank so the oracle
    value-checks every surviving node and in-core degree; convergence is
    certified in pytest against a run-to-fixpoint Python reference
    (operators/graph.py:kcore_rounds)."""
    from etl_pipeline_last_fm_spark.operators.graph import (
        cosupplier_edges,
        kcore_rounds,
    )

    return kcore_rounds(
        cosupplier_edges(load_table(spark, sf_dir, "lineitem")), k=3, n_rounds=4
    )


def q_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer LEFT OUTER JOIN orders with the join-side
    filter INSIDE the join condition (not a WHERE — zero-order customers
    must survive), per-customer order count, then the distribution of
    those counts. Exercises outer-join-with-residual-condition +
    two-level reaggregation, a plan shape no other entry covers."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))  # count(col): NULLs excluded
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-group AVG subquery (lineitems below
    20% of their part's average quantity), decorrelated to a join against
    the per-part aggregate. The 0.2*avg comparison is EXACT integer
    cross-multiplication: qty < 0.2 * (sum/cnt)  <=>  5*qty*cnt < sum —
    no float division anywhere in the predicate, so the boundary rows
    match the oracle bit-for-bit. Output = total price of those lines / 7
    (weekly-revenue-loss framing) with the pure-integer round identity."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    qty = F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long")
    per_part = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.sum(qty).alias("__sq"), F.count(F.lit(1)).alias("__cnt")
    )
    e2 = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == F.col("__pk"))
        .filter(qty * F.lit(5) * F.col("__cnt") < F.col("__sq"))
        .agg(F.sum(e2).alias("__se2"))
        .select(
            (F.expr(
                "(2 * CAST(coalesce(__se2, 0L) AS DECIMAL(38,0)) * 100 + 700)"
                " div 1400"
            ).cast("double")
             / F.lit(100.0)).alias("avg_weekly_loss")
        )
    )


def q_top_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING on a grouped SUM feeding an IN-subquery
    (expressed as the decorrelated join Spark plans it as), rejoined to
    orders+customer, top-100 by o_totalprice with o_orderkey tie-break.
    sum_qty is exact integer."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    qty = F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_name", "c_custkey", "l_orderkey",
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("totalprice").desc(), F.col("l_orderkey"))
        .limit(100)
    )


# Unordered name -> callable map; the graded-window ORDERING lives in
# __spark_entry__.py (the driver grades the first 50 entries only).
QUERIES = {
    "bpe_train": q_bpe_train,
    "cohort_retention": q_cohort_retention,
    "corpus_drift": q_corpus_drift,
    "dedup_snm_multipass": q_dedup_snm_multipass,
    "dedup_sorted_neighborhood": q_dedup_sorted_neighborhood,
    "disjunctive_predicates": q_disjunctive_predicates,
    "epoch_shuffle": q_epoch_shuffle,
    "except_all": q_except_all,
    "inverted_index": q_inverted_index,
    "kcore": q_kcore,
    "key_skew_profile": q_key_skew_profile,
    "label_centroids": q_label_centroids,
    "market_basket": q_market_basket,
    "market_share": q_market_share,
    "merge_upsert": q_merge_upsert,
    "mode_per_group": q_mode_per_group,
    "nation_trade_volume": q_nation_trade_volume,
    "order_distribution": q_order_distribution,
    "pagerank": q_pagerank,
    "pagerank_weighted": q_pagerank_weighted,
    "rank_metrics": q_rank_metrics,
    "regional_revenue": q_regional_revenue,
    "relational_division": q_relational_division,
    "render_packs": q_render_packs,
    "session_transitions": q_session_transitions,
    "session_window_native": q_session_window_native,
    "set_ops": q_set_ops,
    "shipping_priority": q_shipping_priority,
    "sim_ann_ivfpq": q_sim_ann_ivfpq,
    "sim_ann_ivfpq_residual": q_sim_ann_ivfpq_residual,
    "small_qty_revenue": q_small_qty_revenue,
    "table_checksum": q_table_checksum,
    "top_volume_orders": q_top_volume_orders,
    "triangle_count": q_triangle_count,
    "unpivot_metrics": q_unpivot_metrics,
}


def oracles() -> dict[str, str]:
    from etl_pipeline_last_fm_spark.operators.dedup import (
        embedding_near_dups_blocked_oracle_sql,
        embedding_near_dups_oracle_sql,
        minhash_lsh_pairs_oracle_sql,
    )
    from etl_pipeline_last_fm_spark.operators.sessions import sessionize_oracle_sql
    from etl_pipeline_last_fm_spark.operators.similarity import lsh_ann_topk_oracle_sql
    from etl_pipeline_last_fm_spark.operators.text import (
        EN_STOPWORDS,
        lang_id_oracle_sql,
        quality_oracle_sql,
    )

    en_list = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    return {
        "bpe_train": packing_ops.bpe_train_oracle_sql(
            n_merges=6, doc_pred="doc_id < 500"
        ),
        "dedup_sorted_neighborhood": _snm_oracle(),
        "dedup_snm_multipass": _snm_multipass_oracle(),
        "cohort_retention": _cohort_oracle(),
        "regional_revenue": f"""
            WITH li AS (
                SELECT l_orderkey, l_suppkey,
                       CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                       * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)) AS rev4
                FROM lineitem
            )
            SELECT n_name AS nation,
                   CAST((CAST(SUM(rev4) AS BIGINT) + 50) // 100 AS DOUBLE) / 100.0
                       AS revenue
            FROM li
            JOIN orders   ON l_orderkey = o_orderkey
                         AND epoch_us(o_orderdate) >= {_US_1996}
                         AND epoch_us(o_orderdate) <  {_US_1997}
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
            GROUP BY 1
        """,
        "shipping_priority": f"""
            WITH li AS (
                SELECT l_orderkey, l_shipdate,
                       CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                       * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)) AS rev4
                FROM lineitem
                WHERE epoch_us(l_shipdate) > {_US_1996}
            )
            SELECT l_orderkey, o_orderdate, o_orderpriority,
                   CAST((CAST(SUM(rev4) AS BIGINT) + 50) // 100 AS DOUBLE) / 100.0
                       AS revenue
            FROM li
            JOIN orders   ON l_orderkey = o_orderkey
                         AND epoch_us(o_orderdate) < {_US_1996}
            JOIN customer ON o_custkey = c_custkey AND c_mktsegment = 'BUILDING'
            GROUP BY 1, 2, 3
            ORDER BY revenue DESC, o_orderdate, l_orderkey
            LIMIT 10
        """,
        "triangle_count": _graph_mod().triangle_counts_oracle_sql(),
        "pagerank": _graph_mod().pagerank_oracle_sql(n_iter=4),
        "kcore": _graph_mod().kcore_rounds_oracle_sql(k=3, n_rounds=4),
        "pagerank_weighted": _graph_mod().pagerank_weighted_oracle_sql(n_iter=4),
        "rank_metrics": """
            SELECT o_custkey, o_orderkey,
                   CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS total_cents,
                   PERCENT_RANK() OVER (
                       PARTITION BY o_custkey
                       ORDER BY CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT),
                                o_orderkey
                   ) AS pct_rank,
                   CUME_DIST() OVER (
                       PARTITION BY o_custkey
                       ORDER BY CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT),
                                o_orderkey
                   ) AS cume
            FROM orders
            WHERE o_totalprice IS NOT NULL
        """,
        "except_all": f"""
            SELECT CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS qty
            FROM lineitem
            WHERE epoch_us(l_shipdate) >= {_US_1996}
              AND epoch_us(l_shipdate) <  {_US_1996_07}
            EXCEPT ALL
            SELECT CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS qty
            FROM lineitem
            WHERE epoch_us(l_shipdate) >= {_US_1996_07}
              AND epoch_us(l_shipdate) <  {_US_1997}
        """,
        "relational_division": """
            WITH o AS (
                SELECT o_custkey,
                       epoch_us(o_orderdate) // 31557600000000 AS y
                FROM orders
            )
            SELECT o_custkey, CAST(COUNT(DISTINCT y) AS BIGINT) AS years
            FROM o WHERE y BETWEEN 25 AND 28
            GROUP BY o_custkey
            HAVING COUNT(DISTINCT y) = 4
        """,
        "mode_per_group": """
            WITH census AS (
                SELECT l_returnflag AS flag,
                       CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS qty,
                       COUNT(*) AS cnt
                FROM lineitem GROUP BY 1, 2
            ),
            ranked AS (
                SELECT flag, qty, cnt,
                       ROW_NUMBER() OVER (
                           PARTITION BY flag ORDER BY cnt DESC, qty
                       ) AS rn
                FROM census
            )
            SELECT flag, qty AS mode_qty, cnt AS n FROM ranked WHERE rn = 1
        """,
        "table_checksum": f"""
            WITH h AS (
                SELECT {_hash60_sql(
                    "concat_ws('|', l_orderkey, l_linenumber, "
                    "CAST(FLOOR(l_quantity + 0.5) AS BIGINT), "
                    "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT), "
                    "CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT), "
                    "l_returnflag, l_linestatus)"
                )} AS h
                FROM lineitem
            )
            SELECT CAST(h % 64 AS BIGINT) AS bucket,
                   COUNT(*) AS n_rows,
                   CAST(SUM(h) % {_ck_mod()} AS BIGINT) AS checksum
            FROM h GROUP BY 1
        """,
        "disjunctive_predicates": """
            SELECT CAST((COALESCE(CAST(SUM(
                       CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                       * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT))
                   ) AS BIGINT), 0) + 50) // 100 AS DOUBLE) / 100.0 AS revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
                   AND CAST(FLOOR(l_quantity + 0.5) AS BIGINT) BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
                   AND CAST(FLOOR(l_quantity + 0.5) AS BIGINT) BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
                   AND CAST(FLOOR(l_quantity + 0.5) AS BIGINT) BETWEEN 20 AND 30)
        """,
        # Gaps-and-islands twin of the native session_window operator:
        # same 30-min gap, same half-open end bound (last event + gap).
        "session_window_native": """
            WITH ev AS (
                SELECT user_id, event_id, epoch_us(ts) AS us,
                       CAST(FLOOR(COALESCE(value, 0.0) * 100 + 0.5) AS BIGINT)
                           AS cents
                FROM events
            ),
            -- event_id tie-break on BOTH window clauses: without it, two
            -- events at the same (user_id, us) could sort differently in
            -- flagged vs islands, misaligning the running sum with its
            -- flags (same reason the lead_lag oracle orders by (ts,
            -- event_id)). A tie can't SPLIT a session (gap 0 <= 30 min),
            -- but the misalignment could.
            flagged AS (
                SELECT user_id, us, cents,
                       CASE WHEN us - LAG(us) OVER (
                                PARTITION BY user_id ORDER BY us, event_id
                            ) > 1800000000 THEN 1
                            WHEN LAG(us) OVER (
                                PARTITION BY user_id ORDER BY us, event_id
                            ) IS NULL THEN 1
                            ELSE 0 END AS new_sess,
                       event_id
                FROM ev
            ),
            islands AS (
                SELECT user_id, us, cents,
                       SUM(new_sess) OVER (
                           PARTITION BY user_id ORDER BY us, event_id
                           ROWS UNBOUNDED PRECEDING
                       ) AS sess_no
                FROM flagged
            )
            SELECT user_id,
                   CAST(MIN(us) AS BIGINT) AS start_us,
                   CAST(MAX(us) + 1800000000 AS BIGINT) AS end_us,
                   COUNT(*) AS n_events,
                   CAST(SUM(cents) AS BIGINT) AS sum_cents
            FROM islands
            GROUP BY user_id, sess_no
        """,
        "corpus_drift": text_ops.corpus_drift_oracle_sql(),
        "inverted_index": text_ops.inverted_index_oracle_sql(),
        "merge_upsert": scd_ops.merge_upsert_oracle_sql(),
        "set_ops": f"""
            WITH pre AS (
                SELECT o_custkey FROM orders
                WHERE epoch_us(o_orderdate) >= {_US_1996}
                  AND epoch_us(o_orderdate) <  {_US_1996_07}
            ),
            post AS (
                SELECT o_custkey FROM orders
                WHERE epoch_us(o_orderdate) >= {_US_1996_07}
                  AND epoch_us(o_orderdate) <  {_US_1997}
            )
            SELECT o_custkey, 'both' AS segment
            FROM (SELECT o_custkey FROM pre INTERSECT SELECT o_custkey FROM post)
            UNION ALL
            SELECT o_custkey, 'h1_only' AS segment
            FROM (SELECT o_custkey FROM pre EXCEPT SELECT o_custkey FROM post)
            UNION ALL
            SELECT o_custkey, 'h2_only' AS segment
            FROM (SELECT o_custkey FROM post EXCEPT SELECT o_custkey FROM pre)
        """,
        "session_transitions": """
            WITH seq AS (
                SELECT event_type AS from_type,
                       LEAD(event_type) OVER (
                           PARTITION BY user_id
                           ORDER BY epoch_us(ts), event_id
                       ) AS to_type
                FROM events
            )
            SELECT from_type, to_type, COUNT(*) AS n
            FROM seq WHERE to_type IS NOT NULL
            GROUP BY from_type, to_type
        """,
        "sim_ann_ivfpq": sim_ops.ivfpq_ann_topk_seeded_oracle_sql(),
        "sim_ann_ivfpq_residual": sim_ops.ivfpq_residual_ann_topk_seeded_oracle_sql(),
        "market_basket": """
            WITH op AS (
                SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            ),
            n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM op),
            item AS (
                SELECT l_partkey AS p, COUNT(*) AS c FROM op GROUP BY 1
            ),
            freq AS (SELECT p FROM item WHERE c >= 2),
            opf AS (
                SELECT op.l_orderkey, op.l_partkey FROM op
                WHERE op.l_partkey IN (SELECT p FROM freq)
            ),
            pairs AS (
                SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                       COUNT(*) AS support
                FROM opf a JOIN opf b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
                GROUP BY 1, 2
                HAVING COUNT(*) >= 2
            )
            SELECT part_a, part_b, support,
                   CAST((CAST(support AS HUGEINT) * n.n_orders * 1000000)
                     // (CAST(ca.c AS HUGEINT) * cb.c) AS BIGINT) AS lift_ppm
            FROM pairs
            JOIN item ca ON ca.p = part_a
            JOIN item cb ON cb.p = part_b
            CROSS JOIN n
        """,
        "epoch_shuffle": """
            SELECT doc_id,
                   CAST(ROW_NUMBER() OVER (
                       ORDER BY ('0x' || substring(
                           md5('epoch1:' || CAST(doc_id AS VARCHAR)), 1, 15)
                       )::BIGINT, doc_id
                   ) AS BIGINT) AS shuffle_pos
            FROM documents
        """,
        # Composed on pack_sequences' own oracle (not a hand copy): if the
        # packing semantics or tokenizer ever change, BOTH engines' twins
        # move together.
        "render_packs": f"""
            WITH p AS ({packing_ops.pack_sequences_oracle_sql(budget=512)})
            SELECT p.seq_id,
                   COUNT(*) AS n_docs,
                   string_agg(d.text, '<|eos|>' ORDER BY d.doc_id) AS packed_text
            FROM p JOIN documents d ON p.doc_id = d.doc_id
            GROUP BY p.seq_id
        """,
        "nation_trade_volume": f"""
            WITH li AS (
                SELECT l_orderkey, l_suppkey,
                       CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                       * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)) AS rev4
                FROM lineitem
            )
            SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
                   epoch_us(o_orderdate) // 31557600000000 AS epoch_year_bucket,
                   CAST((CAST(SUM(rev4) AS BIGINT) + 50) // 100 AS DOUBLE) / 100.0
                       AS volume
            FROM li
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
               OR (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
            GROUP BY 1, 2, 3
        """,
        "market_share": """
            WITH li AS (
                SELECT l_orderkey, l_suppkey,
                       CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                       * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)) AS rev4
                FROM lineitem
            )
            SELECT epoch_us(o_orderdate) // 31557600000000 AS epoch_year_bucket,
                   (CAST(SUM(CASE WHEN n2.n_name = 'NATION_3' THEN rev4 ELSE 0 END)
                         AS BIGINT) * 1000000)
                     // CAST(SUM(rev4) AS BIGINT) AS share_ppm
            FROM li
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region   ON n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            GROUP BY 1
        """,
        "unpivot_metrics": """
            WITH wide AS (
                SELECT l_returnflag, l_linestatus,
                       CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
                           AS sum_qty,
                       CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                            AS BIGINT) AS sum_price_cents,
                       COUNT(*) AS n_rows
                FROM lineitem GROUP BY 1, 2
            )
            SELECT l_returnflag, l_linestatus, metric, value
            FROM wide UNPIVOT (value FOR metric IN (sum_qty, sum_price_cents, n_rows))
        """,
        "key_skew_profile": """
            WITH
            p1 AS (SELECT COUNT(*) AS n FROM lineitem GROUP BY l_orderkey),
            p2 AS (SELECT COUNT(*) AS n FROM lineitem GROUP BY l_partkey),
            p3 AS (SELECT COUNT(*) AS n FROM lineitem GROUP BY l_suppkey),
            p4 AS (SELECT COUNT(*) AS n FROM lineitem GROUP BY l_returnflag)
            SELECT 'l_orderkey' AS key_col, COUNT(*) AS n_keys,
                   CAST(SUM(n) AS BIGINT) AS n_rows,
                   CAST(MAX(n) AS BIGINT) AS max_key_rows,
                   (CAST(MAX(n) AS BIGINT) * 1000000) // CAST(SUM(n) AS BIGINT)
                       AS top_share_ppm
            FROM p1
            UNION ALL
            SELECT 'l_partkey', COUNT(*), CAST(SUM(n) AS BIGINT),
                   CAST(MAX(n) AS BIGINT),
                   (CAST(MAX(n) AS BIGINT) * 1000000) // CAST(SUM(n) AS BIGINT)
            FROM p2
            UNION ALL
            SELECT 'l_suppkey', COUNT(*), CAST(SUM(n) AS BIGINT),
                   CAST(MAX(n) AS BIGINT),
                   (CAST(MAX(n) AS BIGINT) * 1000000) // CAST(SUM(n) AS BIGINT)
            FROM p3
            UNION ALL
            SELECT 'l_returnflag', COUNT(*), CAST(SUM(n) AS BIGINT),
                   CAST(MAX(n) AS BIGINT),
                   (CAST(MAX(n) AS BIGINT) * 1000000) // CAST(SUM(n) AS BIGINT)
            FROM p4
        """,
        "label_centroids": """
            WITH comp AS (
                SELECT label,
                       generate_subscripts(embedding, 1) AS pos,
                       CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1e6 + 0.5)
                            AS BIGINT) AS q
                FROM embeddings
            ),
            s AS (
                SELECT label, pos, CAST(SUM(q) AS BIGINT) AS sq, COUNT(*) AS n
                FROM comp GROUP BY label, pos
            )
            SELECT label, CAST(pos AS INTEGER) AS pos,
                   sq // n AS centroid_micro, n
            FROM s
        """,
        "order_distribution": """
            WITH per_cust AS (
                SELECT c_custkey, COUNT(o_orderkey) AS c_count
                FROM customer LEFT JOIN orders
                  ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
                GROUP BY c_custkey
            )
            SELECT c_count, COUNT(*) AS custdist
            FROM per_cust GROUP BY c_count
        """,
        "small_qty_revenue": """
            WITH q AS (
                SELECT l_partkey,
                       CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS qty,
                       CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS e2
                FROM lineitem
            ),
            pa AS (
                SELECT l_partkey, CAST(SUM(qty) AS BIGINT) AS sq,
                       COUNT(*) AS cnt
                FROM q GROUP BY l_partkey
            )
            SELECT CAST((2 * COALESCE(CAST(SUM(e2) AS HUGEINT), 0) * 100 + 700)
                        // 1400 AS DOUBLE) / 100.0 AS avg_weekly_loss
            FROM q
            JOIN part ON q.l_partkey = p_partkey AND p_brand = 'Brand#11'
            JOIN pa ON pa.l_partkey = q.l_partkey
            WHERE 5 * q.qty * pa.cnt < pa.sq
        """,
        "top_volume_orders": """
            WITH big AS (
                SELECT l_orderkey,
                       CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
                           AS sum_qty
                FROM lineitem GROUP BY l_orderkey
                HAVING sum_qty > 150
            )
            SELECT c_name, c_custkey, l_orderkey,
                   o_orderdate AS orderdate, o_totalprice AS totalprice, sum_qty
            FROM big
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            ORDER BY totalprice DESC, l_orderkey
            LIMIT 100
        """,
        # still rows-only: sim_ann_ivf (centroids are trained from data at
        # runtime, not a static literal the SQL twin could share); its IVF
        # plumbing is value-checked via sim_ann_ivf_seeded.,
    }


def _ck_mod() -> int:
    from etl_pipeline_last_fm_spark.streaming.drift import CK_MOD

    return CK_MOD


def _hash60_sql(expr: str) -> str:
    from etl_pipeline_last_fm_spark.functions.scalar import portable_hash60_sql

    return portable_hash60_sql(expr)


def _graph_mod():
    from etl_pipeline_last_fm_spark.operators import graph

    return graph


def _snm_oracle() -> str:
    from etl_pipeline_last_fm_spark.operators.setsim import (
        sorted_neighborhood_pairs_oracle_sql,
    )

    return sorted_neighborhood_pairs_oracle_sql(window=10)


def _cohort_oracle() -> str:
    from etl_pipeline_last_fm_spark.operators.cohort import (
        cohort_retention_oracle_sql,
    )

    return cohort_retention_oracle_sql()


def _snm_multipass_oracle() -> str:
    from etl_pipeline_last_fm_spark.operators.setsim import (
        sorted_neighborhood_pairs_oracle_sql,
    )

    return sorted_neighborhood_pairs_oracle_sql(window=10, multipass=True)
