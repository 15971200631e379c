"""Blocked (pigeonhole) SimHash near-dup must equal the pairwise form."""

from __future__ import annotations

from etl_pipeline_last_fm_spark.operators.dedup import (
    simhash_near_dups,
    simhash_near_dups_blocked,
)
from etl_pipeline_last_fm_spark.sources.tables import load_table


def test_blocked_equals_pairwise(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    for h in (1, 3):
        pairwise = {
            (r.doc_a, r.doc_b, r.hamming)
            for r in simhash_near_dups(docs, max_hamming=h).collect()
        }
        blocked = {
            (r.doc_a, r.doc_b, r.hamming)
            for r in simhash_near_dups_blocked(docs, max_hamming=h).collect()
        }
        assert blocked == pairwise, f"max_hamming={h}"
