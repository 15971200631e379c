"""End-to-end curation pipeline composition: the LLM-data operators chained
the way a real corpus build runs them — proof the pieces compose as one
declarative DataFrame plan, not just in isolation.

    lang-id -> quality gate -> LM-score gate -> near-dup keep-list
    -> deterministic split -> token budget -> sequence packing

Asserts: monotone non-increasing survivor counts through the filter
stages, budget respected, packing offsets consistent — and the composed
filter chain stays JVM-side (no Python eval nodes).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_last_fm_spark.operators.dedup import dedup_keep_list
from etl_pipeline_last_fm_spark.operators.packing import pack_sequences
from etl_pipeline_last_fm_spark.operators.sampling import (
    split_assign,
    token_budget_sample,
)
from etl_pipeline_last_fm_spark.operators.text import (
    lang_id,
    lm_score,
    quality_score,
)
from etl_pipeline_last_fm_spark.sources.tables import load_table


def test_full_curation_chain(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. language filter (predicted language, not the table's label)
    langs = lang_id(docs).select("doc_id", "lang_pred")
    stage1 = docs.join(langs, "doc_id").filter(F.col("lang_pred") == "en")
    n1 = stage1.count()

    # 2. heuristic quality gate
    q = quality_score(stage1).select("doc_id", "stop_ratio")
    stage2 = stage1.join(q, "doc_id").filter(F.col("stop_ratio") > 0)
    n2 = stage2.count()

    # 3. statistical (unigram LM) gate: drop the worst-scoring decile
    lm = lm_score(stage2.select("doc_id", "text"))
    cut = lm.approxQuantile("mean_logprob_micro", [0.1], 0.001)[0]
    keep_lm = lm.filter(F.col("mean_logprob_micro") >= cut).select("doc_id")
    stage3 = stage2.join(keep_lm, "doc_id")
    n3 = stage3.count()

    # 4. near-dup removal: keep-list marks cluster losers to drop
    keep = dedup_keep_list(stage3.select("doc_id", "text"))
    drop = keep.filter(F.col("is_dup")).select("doc_id")
    stage4 = stage3.join(drop, "doc_id", "left_anti")
    n4 = stage4.count()

    assert n0 >= n1 >= n2 >= n3 >= n4 > 0, (n0, n1, n2, n3, n4)

    # 5. deterministic split, then a token budget on the train split
    split = split_assign(stage4, id_col="doc_id")
    train = stage4.join(
        split.filter(F.col("split") == "train").select("doc_id"), "doc_id"
    )
    budget = 3_000
    sampled = token_budget_sample(
        train.select("doc_id", "text").withColumn("source", F.lit("all")),
        budgets={"all": budget},
    )
    spent = sampled.agg(F.sum("n_tokens")).collect()[0][0]
    # The budget bounds the EXCLUSIVE prefix, so overshoot is < one doc.
    max_doc = sampled.agg(F.max("n_tokens")).collect()[0][0]
    assert spent < budget + max_doc

    # 6. pack the sampled docs into fixed 512-token sequences
    packed = pack_sequences(
        train.join(sampled.select("doc_id"), "doc_id"), budget=512
    )
    rows = packed.orderBy("doc_id").collect()
    running = 0
    for r in rows:
        assert r["tok_offset"] == running
        running += r["n_tokens"]

    # The composed filter chain (stages 1-4) is one JVM-side plan.
    plan = stage4._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
