"""Blocked (pigeonhole) SimHash near-dup must equal the pairwise form."""

from __future__ import annotations

from etl_pipeline_last_fm_spark.operators.dedup import (
    simhash_near_dups,
    simhash_near_dups_blocked,
)
from etl_pipeline_last_fm_spark.sources.tables import load_table


def test_embedding_blocked_is_sound_subset(spark, sf_dir):
    """LSH-blocked embedding dedup is approximate (may miss split pairs) but
    must never emit a pair below threshold, and every emitted pair must also
    be in the exact pairwise output."""
    from etl_pipeline_last_fm_spark.operators.dedup import (
        embedding_near_dups,
        embedding_near_dups_blocked,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {(r.id_a, r.id_b): r.sim for r in embedding_near_dups(emb, threshold=0.4).collect()}
    blocked = {
        (r.id_a, r.id_b): r.sim
        for r in embedding_near_dups_blocked(emb, threshold=0.4, n_planes=6).collect()
    }
    assert blocked, "blocked variant found nothing — buckets too fine"
    assert set(blocked) <= set(exact)
    assert all(blocked[k] == exact[k] for k in blocked)


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
