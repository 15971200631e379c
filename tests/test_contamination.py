"""Planted-truth tests for benchmark decontamination: a train doc that copies
an n-gram from a benchmark doc MUST be flagged; clean docs must not be."""

from __future__ import annotations

from etl_pipeline_last_fm_spark.operators.contamination import benchmark_contamination


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_contamination_found(spark):
    bench = _df(spark, [(100, "alpha beta gamma delta epsilon")])
    train = _df(
        spark,
        [
            # copies the benchmark 3-gram "beta gamma delta"
            (1, "intro words beta gamma delta closing words here"),
            (2, "completely unrelated text with no overlap at all"),
        ],
    )
    out = {r["doc_id"]: r for r in benchmark_contamination(train, bench, n=3).collect()}
    assert set(out) == {1}
    assert out[1]["contaminated"] >= 1
    assert 0 < out[1]["contamination_ratio"] <= 1.0


def test_full_copy_has_ratio_one(spark):
    text = "one two three four five six seven eight nine ten"
    bench = _df(spark, [(100, text)])
    train = _df(spark, [(1, text), (2, "nothing shared whatsoever in this document text")])
    out = {r["doc_id"]: r for r in benchmark_contamination(train, bench, n=4).collect()}
    assert out[1]["contamination_ratio"] == 1.0
    assert out[1]["contaminated"] == out[1]["n_shingles"]
    assert 2 not in out


def test_min_hits_threshold(spark):
    bench = _df(spark, [(100, "alpha beta gamma delta epsilon zeta eta theta")])
    train = _df(spark, [(1, "alpha beta gamma filler filler filler filler filler")])
    # doc 1 shares exactly one distinct 3-gram ("alpha beta gamma")
    assert benchmark_contamination(train, bench, n=3, min_hits=1).count() == 1
    assert benchmark_contamination(train, bench, n=3, min_hits=2).count() == 0


def test_short_doc_shingle_degenerate(spark):
    """Docs shorter than n tokens fall back to a single whole-text shingle
    (sequence floor at 0) — must not crash or emit spurious hits."""
    bench = _df(spark, [(100, "tiny doc")])
    train = _df(spark, [(1, "tiny doc"), (2, "other")])
    out = {r["doc_id"]: r for r in benchmark_contamination(train, bench, n=8).collect()}
    assert set(out) == {1}  # identical short docs share their whole-text shingle
