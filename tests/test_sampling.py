"""Deterministic sampling invariants: purity (partitioning/order can't move a
record between splits), proportions, adjacent-split stability, stratum caps."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_last_fm_spark.operators.sampling import split_assign, stratified_sample


@pytest.fixture()
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_split_is_pure_function_of_id(spark, docs):
    base = {r["doc_id"]: r["split"] for r in split_assign(docs).collect()}
    shuffled = {
        r["doc_id"]: r["split"]
        for r in split_assign(docs.repartition(17).sortWithinPartitions(F.desc("doc_id"))).collect()
    }
    assert base == shuffled


def test_split_proportions_roughly_hold(docs):
    counts = {r["split"]: r["n"] for r in split_assign(docs).groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    n = sum(counts.values())
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] / n == pytest.approx(0.8, abs=0.08)


def test_resplit_moves_between_adjacent_splits_only(docs):
    """Growing train 80->90 must only convert val-bucket records to train;
    no train record may leave train."""
    a = {r["doc_id"]: r["split"] for r in split_assign(docs).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in split_assign(docs, weights={"train": 90, "val": 5, "test": 5}).collect()
    }
    for doc_id, s in a.items():
        if s == "train":
            assert b[doc_id] == "train"
        if b[doc_id] == "test":
            assert s == "test"


def test_salt_changes_redeal(docs):
    a = {r["doc_id"]: r["split"] for r in split_assign(docs, salt="v1").collect()}
    b = {r["doc_id"]: r["split"] for r in split_assign(docs, salt="v2").collect()}
    assert a != b  # a re-deal; overwhelming probability on 500 docs


def test_split_weights_must_sum_to_100(docs):
    with pytest.raises(AssertionError):
        split_assign(docs, weights={"train": 50, "val": 10})


def test_stratified_sample_caps_and_determinism(docs):
    out = stratified_sample(docs, strata_col="lang", n_per_stratum=5)
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r["lang"], []).append(r["sample_rank"])
    for lang, ranks in per.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5
    again = {(r["doc_id"], r["sample_rank"]) for r in
             stratified_sample(docs.repartition(13), strata_col="lang", n_per_stratum=5).collect()}
    assert again == {(r["doc_id"], r["sample_rank"]) for r in rows}


def test_mixture_sample_nested_and_deterministic(spark, sf_dir):
    """Raising a keep rate strictly grows the kept set (nested samples);
    rate 0 drops a stratum entirely; rate 10000 keeps it whole."""
    from etl_pipeline_last_fm_spark.operators.sampling import mixture_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lo = {r["doc_id"] for r in mixture_sample(docs, {"en": 2000}).collect()}
    hi = {r["doc_id"] for r in mixture_sample(docs, {"en": 6000}).collect()}
    assert lo < hi  # strictly nested on this corpus
    none_en = mixture_sample(docs, {"en": 0}).filter("lang = 'en'").count()
    assert none_en == 0
    all_kept = mixture_sample(docs, {}).count()
    assert all_kept == docs.count()
