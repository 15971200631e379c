"""ANN recall gates: every approximate-similarity operator is measured
against the exact brute-force baseline, with asserted floors.

The fixture embeddings are near-random (max pairwise cosine ~0.51, no
cluster structure — TESTDATA quirk), which is the WORST case for ANN:
true neighbors sit barely above the noise floor, so hyperplane buckets
split them almost uniformly. The floors below are therefore low in
absolute terms but deterministic (planes and k-means are seeded) and
they pin the qualitative ordering that matters:

    single-bucket LSH  <  multi-probe(1)  <  multi-probe(2),  IVF(probe 4)

measured here at sf0.001: 0.06 / 0.24 / 0.58 recall@5, IVF 0.66.
On a corpus with real near-duplicate structure (the dedup regime) the same
operators approach recall 1.0 — see test_dedup_blocked's planted-pair
checks.
"""

from __future__ import annotations

import pytest

from etl_pipeline_last_fm_spark.operators.similarity import (
    brute_force_topk,
    ivf_ann_topk,
    ivf_ann_topk_seeded,
    lsh_ann_topk,
)
from etl_pipeline_last_fm_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def truth(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    rows = brute_force_topk(emb, n_queries=10, k=5).collect()
    return emb, {(r.q_id, r.cand_id) for r in rows}, {(r.q_id, r.cand_id): r.sim for r in rows}


def _recall(ann_rows, truth_pairs) -> float:
    got = {(r.q_id, r.cand_id) for r in ann_rows}
    return len(got & truth_pairs) / len(truth_pairs)


@pytest.mark.parametrize(
    "probe_flips,floor",
    [(0, 0.04), (1, 0.15), (2, 0.45)],
)
def test_lsh_ann_recall(truth, probe_flips, floor):
    emb, truth_pairs, _ = truth
    rows = lsh_ann_topk(emb, n_queries=10, k=5, n_planes=6, probe_flips=probe_flips).collect()
    r = _recall(rows, truth_pairs)
    assert r >= floor, f"lsh probe_flips={probe_flips}: recall@5 {r:.2f} < floor {floor}"


def test_lsh_multiprobe_recall_monotone(truth):
    """More probes may only widen the candidate set, never shrink recall."""
    emb, truth_pairs, _ = truth
    recalls = [
        _recall(
            lsh_ann_topk(emb, n_queries=10, k=5, n_planes=6, probe_flips=f).collect(),
            truth_pairs,
        )
        for f in (0, 1, 2)
    ]
    assert recalls == sorted(recalls), recalls


def test_ivf_ann_recall(truth):
    emb, truth_pairs, _ = truth
    rows = ivf_ann_topk(emb, n_queries=10, k=5, n_centroids=16, nprobe=4).collect()
    r = _recall(rows, truth_pairs)
    assert r >= 0.4, f"ivf: recall@5 {r:.2f} < floor 0.4"


def test_ivf_seeded_recall_and_shape(truth):
    """Seed-centroid IVF (the value-checked twin): untrained corpus-point
    centroids cost some recall vs k-means but the candidate machinery is
    identical — require a floor and exactly k results per query."""
    emb, truth_pairs, _ = truth
    rows = ivf_ann_topk_seeded(emb, n_queries=10, k=5, n_centroids=16, nprobe=4).collect()
    r = _recall(rows, truth_pairs)
    assert r >= 0.3, f"ivf_seeded: recall@5 {r:.2f} < floor 0.3"
    per_q: dict[int, int] = {}
    for row in rows:
        per_q[row.q_id] = per_q.get(row.q_id, 0) + 1
    assert all(c == 5 for c in per_q.values()), per_q


def test_ann_sims_are_exact_for_scored_pairs(truth):
    """ANN approximates WHICH pairs get scored, never the score itself:
    any (query, candidate) the ANN emits must carry the identical rounded
    cosine the brute-force path computes."""
    emb, _, truth_sims = truth
    for rows in (
        lsh_ann_topk(emb, n_queries=10, k=5, n_planes=6, probe_flips=2).collect(),
        ivf_ann_topk(emb, n_queries=10, k=5, n_centroids=16, nprobe=4).collect(),
    ):
        for r in rows:
            if (r.q_id, r.cand_id) in truth_sims:
                assert r.sim == truth_sims[(r.q_id, r.cand_id)], (r.q_id, r.cand_id)
