"""sim_ann_ivfpq phase attribution (VERDICT r10 item 5): instrument the
IVF-PQ query's phases at 1x (sf0.1) and 10x (/tmp/sf1x, built by
headline_scale_smoke.py) the same way dedup_minhash_lsh got it in round
10 — each phase boundary persisted and counted in isolation, so the
marginal cost of every stage is measured, not guessed.

Phases (mirroring operators/similarity.py ivfpq_ann_topk_seeded):
  P0  index build: seeded_centroids + pq_seed_codebooks (2 bounded
      driver collects of <= 16 rows each)
  P1  corpus encode: scan -> subvector/self-dot precompute (vx) ->
      cluster assignment (16 packed literal cosine argmax) -> PQ codes
      (4 subspaces x 16 literal L2s, min-packed)   [pure map]
  P1a vx precompute alone (separates the shared hoist from the
      assignment/encode expressions)
  P2  query side: probes (sorted packed array -> nprobe clusters) +
      per-query distance tables                      [n_queries rows]
  P3  candidate join + ADC scoring, marginal: corpus/q persisted first
  P4  final per-query top-k window, marginal: scored persisted first
  total = the bench-protocol warm number for reference

Usage: python scripts/ivfpq_phase_ab.py [sf_dir ...]
(default: /root/testdata/sf0.1 then /tmp/sf1x if it exists)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_pipeline_last_fm_spark.session import get_spark
from etl_pipeline_last_fm_spark.operators import similarity as S
from etl_pipeline_last_fm_spark.sources.tables import load_table


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def phases(spark, sf_dir: str, n_queries=10, k=5, n_centroids=16, nprobe=4,
           n_subspaces=4, n_codes=16) -> dict:
    emb = load_table(spark, sf_dir, "embeddings")
    out: dict = {}

    t0 = time.perf_counter()
    cents = S.seeded_centroids(emb, n_centroids)
    books = S.pq_seed_codebooks(emb, n_subspaces, n_codes)
    out["P0_index_collects"] = round(time.perf_counter() - t0, 3)

    dim = sum(len(books[m][0][1]) for m in range(n_subspaces))
    sub = dim // n_subspaces
    v = emb.select(F.col("vec_id").alias("id"), S._as_double(F.col("embedding")).alias("e"))
    packed_scores = S._centroid_packed_scores(cents)
    sub_vec = S._sub_vec_factory(sub)

    vx = v.select(
        "id", "e", *[sub_vec(F.col("e"), m).alias(f"sv{m}") for m in range(n_subspaces)]
    ).select(
        "id", "e",
        *[F.col(f"sv{m}") for m in range(n_subspaces)],
        *[S._self_dot(F.col(f"sv{m}")).alias(f"vv{m}") for m in range(n_subspaces)],
    )
    out["P1a_vx_precompute"] = _noop(vx)

    cluster = (F.lit(1023) - F.greatest(*packed_scores(F.col("e"))) % F.lit(1024)).cast("int")
    enc_cols = []
    for m, book in enumerate(books):
        packed = [
            F.floor(S._l2_from_vv(F.col(f"vv{m}"), F.col(f"sv{m}"), ce) * F.lit(1e6) + F.lit(0.5)).cast("long")
            * F.lit(1024) + F.lit(cid)
            for cid, ce in book
        ]
        enc_cols.append((F.least(*packed) % F.lit(1024)).cast("int").alias(f"c{m}"))
    corpus = vx.select("id", cluster.alias("cluster"), *enc_cols)
    out["P1_corpus_encode"] = _noop(corpus)

    packed_arr = F.array(*packed_scores(F.col("e")))
    probes = F.transform(
        F.slice(F.sort_array(packed_arr, asc=False), 1, nprobe),
        lambda p: (F.lit(1023) - p % F.lit(1024)).cast("int"),
    )
    q = (
        vx.filter(F.col("id") < n_queries)
        .select(
            F.col("id").alias("q_id"),
            F.explode(probes).alias("cluster"),
            *[
                F.array(*[S._l2_from_vv(F.col(f"vv{m}"), F.col(f"sv{m}"), ce) for _, ce in book]).alias(f"dt{m}")
                for m, book in enumerate(books)
            ],
        )
    )
    out["P2_query_probes_tables"] = _noop(q)

    corpus_p = corpus.persist()
    q_p = q.persist()
    corpus_p.count(), q_p.count()
    adc = None
    for m in range(n_subspaces):
        term = F.element_at(F.col(f"dt{m}"), F.col(f"c{m}") + 1)
        adc = term if adc is None else adc + term
    scored = (
        corpus_p.join(F.broadcast(q_p), "cluster")
        .filter(F.col("id") != F.col("q_id"))
        .select("q_id", F.col("id").alias("cand_id"), adc.alias("__d"))
    )
    out["P3_join_adc_marginal"] = _noop(scored)
    out["P3_candidate_rows"] = scored.count()

    scored_p = scored.persist()
    scored_p.count()
    from pyspark.sql import Window
    from etl_pipeline_last_fm_spark.functions.scalar import half_up_round
    w = Window.partitionBy("q_id").orderBy(
        F.floor(F.col("__d") * 1e6 + F.lit(0.5)).asc(), F.col("cand_id")
    )
    final = (
        scored_p.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "cand_id", half_up_round(F.col("__d"), 6).alias("approx_d"), "rnk")
    )
    out["P4_topk_window_marginal"] = _noop(final)
    for df in (corpus_p, q_p, scored_p):
        df.unpersist()

    # bench-protocol reference: warm rebuild + min-of-3 re-executions
    full = S.ivfpq_ann_topk_seeded(emb)
    _noop(full)
    out["total_warm_min3"] = min(_noop(S.ivfpq_ann_topk_seeded(emb)) for _ in range(3))
    return out


def main() -> None:
    dirs = sys.argv[1:] or [
        d for d in ("/root/testdata/sf0.1", "/tmp/sf1x") if os.path.isdir(d)
    ]
    spark = get_spark(app_name="ivfpq-phase-ab")
    result = {}
    for d in dirs:
        result[d] = phases(spark, d)
        print(f"[ivfpq] {d}: {result[d]}", flush=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
