"""connected_components / dedup_keep_list: planted cluster truth plus a
random-graph equivalence check against a pure-Python BFS."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from etl_pipeline_last_fm_spark.operators.dedup import connected_components, dedup_keep_list


def _cc(pairs):
    """Pure-Python reference: BFS components over an edge list."""
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    label = {}
    for start in adj:
        if start in label:
            continue
        seen, stack = {start}, [start]
        while stack:
            n = stack.pop()
            for m in adj[n]:
                if m not in seen:
                    seen.add(m)
                    stack.append(m)
        rep = min(seen)
        for n in seen:
            label[n] = rep
    return label


def test_chain_is_one_cluster(spark):
    # A~B, B~C, C~D: transitive chain -> single cluster with rep A, even
    # though A and D were never directly paired.
    pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "doc_a long, doc_b long")
    out = {r["node"]: r["label"] for r in connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1}


def test_separate_clusters_stay_separate(spark):
    pairs = spark.createDataFrame([(1, 2), (10, 11), (11, 12)], "doc_a long, doc_b long")
    out = {r["node"]: r["label"] for r in connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 10: 10, 11: 10, 12: 10}


def test_random_graph_matches_python_bfs(spark):
    rng = random.Random(7)
    nodes = list(range(200))
    pairs = [(min(a, b), max(a, b)) for a, b in
             ((rng.choice(nodes), rng.choice(nodes)) for _ in range(150)) if a != b]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    expect = _cc(pairs)
    got = {r["node"]: r["label"] for r in connected_components(df).collect()}
    assert got == expect


def test_keep_list_on_fixture(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = dedup_keep_list(docs).collect()
    assert out, "fixture corpus has planted duplicates"
    for r in out:
        assert r["keep_id"] <= r["doc_id"]
        assert r["is_dup"] == (r["keep_id"] != r["doc_id"])
    # every cluster representative appears as its own keeper
    keeps = {r["keep_id"] for r in out}
    ids = {r["doc_id"]: r for r in out}
    for k in keeps:
        assert ids[k]["is_dup"] is False


def test_keep_list_exact_mega_cluster(spark):
    """Content duplicated many times has identical MinHash signatures in
    every band — the LSH bucket cap would silently drop the whole cluster.
    The exact-fingerprint pre-pass must resolve it regardless of cap."""
    same = "the same boilerplate page " * 10
    uniq = [(i, f"unique words {i} " + " ".join(f"w{i}x{j}" for j in range(30)))
            for i in range(100, 120)]
    docs = spark.createDataFrame(
        [(i, same) for i in range(50)] + uniq, "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in dedup_keep_list(docs).collect()}
    # all 50 exact copies form one cluster kept by doc 0
    for i in range(50):
        assert out[i]["keep_id"] == 0
        assert out[i]["is_dup"] == (i != 0)
    # unique docs never appear in the keep list
    assert all(i not in out for i, _ in uniq)


def test_cc_converging_on_last_round_does_not_raise(spark):
    """A chain needing exactly max_iter propagation rounds must converge
    (the certification no-change round is allowed on top of max_iter)."""
    chain = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "doc_a long, doc_b long")
    out = {r["node"]: r["label"]
           for r in connected_components(chain, max_iter=3).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1}


def test_cc_raises_when_diameter_exceeds_max_iter(spark):
    import pytest

    chain = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=1)
