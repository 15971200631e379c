"""Pin the scale-certification tooling itself (round 12): the 10x/100x
evidence in SCALING.md is only as good as the replication model in
scripts/headline_scale_smoke.py. These invariants run at sf0.001 so a
future edit to the builder cannot silently change what "Nx the data"
means (disjoint key universes, honest text perturbation, norm-preserving
embedding rotation) without failing a test."""

from __future__ import annotations

import importlib.util
import math
import os
import sys

import pytest
from pyspark.sql import functions as F

_SPEC = importlib.util.spec_from_file_location(
    "headline_scale_smoke",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "headline_scale_smoke.py"),
)
smoke = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(smoke)

SRC001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SRC001}/lineitem.parquet")


def test_replication_multiplies_rows_with_disjoint_key_universes(spark, lineitem):
    rep = smoke._replicate(lineitem, ["l_orderkey", "l_partkey", "l_suppkey"],
                           "lineitem", n_rep=3)
    n = lineitem.count()
    assert rep.count() == 3 * n
    # replica r's keys live in [r*2^33, (r+1)*2^33): universes are disjoint,
    # so every join stays key-valid and no cross-replica key collides.
    buckets = (
        rep.select((F.col("l_orderkey") / F.lit(smoke.OFF)).cast("long").alias("u"))
        .groupBy("u").count().orderBy("u").collect()
    )
    assert [(r["u"], r["count"]) for r in buckets] == [(0, n), (1, n), (2, n)]


def test_document_perturbation_vowel_path_below_11_replicas(spark):
    docs = spark.read.parquet(f"{SRC001}/documents.parquet")
    rep = smoke._replicate(docs, ["doc_id"], "documents", n_rep=5)
    # 5 replicas, 5 vowel rotations -> every replica of a doc carries a
    # DISTINCT text (replica 0 is the identity rotation).
    per_doc = (
        rep.withColumn("orig", F.col("doc_id") % F.lit(smoke.OFF))
        .groupBy("orig")
        .agg(F.countDistinct("text").alias("k"), F.count("*").alias("n"))
    )
    bad = per_doc.filter(F.col("k") != F.col("n")).count()
    assert bad == 0


def test_document_perturbation_alphabet_path_above_10_replicas(spark):
    docs = spark.read.parquet(f"{SRC001}/documents.parquet").limit(50)
    rep = smoke._replicate(docs, ["doc_id"], "documents", n_rep=11)
    # 11 replicas under the 26-way alphabet rotation: 11 distinct rotations
    # -> 11 distinct texts per original doc (the vowel scheme would have
    # collapsed replicas r and r+5 onto the same text).
    per_doc = (
        rep.withColumn("orig", F.col("doc_id") % F.lit(smoke.OFF))
        .groupBy("orig")
        .agg(F.countDistinct("text").alias("k"))
    )
    assert per_doc.filter(F.col("k") != 11).count() == 0
    # and text lengths are preserved (translate is 1:1 — the perturbation
    # changes shingle identity, never document size/shape)
    joined = (
        rep.withColumn("orig", F.col("doc_id") % F.lit(smoke.OFF))
        .select("orig", F.length("text").alias("lr"))
        .join(docs.select(F.col("doc_id").alias("orig"),
                          F.length("text").alias("l0")), "orig")
    )
    assert joined.filter(F.col("lr") != F.col("l0")).count() == 0


def test_embedding_rotation_preserves_norms(spark):
    emb = spark.read.parquet(f"{SRC001}/embeddings.parquet").limit(100)
    rep = smoke._replicate(emb, ["vec_id"], "embeddings", n_rep=4)
    norm = F.sqrt(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x))
    src_norms = {
        r["orig"]: r["nv"]
        for r in emb.select((F.col("vec_id")).alias("orig"), norm.alias("nv")).collect()
    }
    rows = rep.select(
        (F.col("vec_id") % F.lit(smoke.OFF)).alias("orig"), norm.alias("nv")
    ).collect()
    assert rows and all(
        math.isclose(r["nv"], src_norms[r["orig"]], rel_tol=1e-9) for r in rows
    )
