"""Unigram-LM scoring semantics (cross-engine parity is in
test_oracle_parity via the lm_score entry)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from etl_pipeline_last_fm_spark.operators.text import lm_score


def test_lm_score_ranks_common_above_rare(spark):
    """A doc of corpus-frequent tokens must out-score a doc of hapaxes."""
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "the cat sat on the mat",
                    "the cat sat on the rug",
                    "the cat sat on the mat",
                    "zyzzyva qwertyuiop flibbertigibbet",
                ],
            }
        )
    )
    out = {r["doc_id"]: r["mean_logprob_micro"] for r in lm_score(df).collect()}
    assert out[1] > out[4]
    assert out[1] == out[3]  # identical docs, identical scores
    # Scores are negative log-probs in micro-nats.
    assert all(v < 0 for v in out.values())


def test_lm_score_partition_invariant(spark, sf_dir):
    from etl_pipeline_last_fm_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, lm_score(docs).collect()))
    b = sorted(map(tuple, lm_score(docs.repartition(13)).collect()))
    assert a == b
