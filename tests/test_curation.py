"""Planted-truth tests for the curation operators added in round 2:
PII scrub, blocked fuzzy name pairs, passage-level dedup stats, top
n-grams. Each asserts exact expected outputs on hand-built inputs (the
oracle-parity suite separately value-checks them against DuckDB on the
fixture corpus)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_last_fm_spark.operators.cleaning import pii_scrub
from etl_pipeline_last_fm_spark.operators.dedup import shared_passage_stats
from etl_pipeline_last_fm_spark.operators.fuzzy import fuzzy_name_pairs
from etl_pipeline_last_fm_spark.operators.text import top_ngrams


def test_pii_scrub_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@corp.example.org or 192.168.0.1 tel 555-123-4567"),
            (2, "no pii here at all"),
            (3, "two mails a@b.io c@d.co one ip 10.1.2.3"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in pii_scrub(df).collect()}
    assert (rows[1].n_emails, rows[1].n_ipv4, rows[1].n_phones) == (1, 1, 1)
    assert (rows[2].n_emails, rows[2].n_ipv4, rows[2].n_phones) == (0, 0, 0)
    assert (rows[3].n_emails, rows[3].n_ipv4, rows[3].n_phones) == (2, 1, 0)
    # Redaction replaces every occurrence; length reflects the tags.
    red1 = "mail me at <EMAIL> or <IP> tel <PHONE>"
    assert rows[1].redacted_len == len(red1)
    import hashlib

    assert rows[1].redacted_md5 == hashlib.md5(red1.encode()).hexdigest()
    assert rows[2].redacted_len == len("no pii here at all")


def test_fuzzy_name_pairs_blocked(spark):
    df = spark.createDataFrame(
        [
            (1, "small ring"),
            (2, "small rink"),   # dist 1 from ring, same block
            (3, "small gear"),   # dist 4 from ring -> excluded
            (4, "smalle ring"),  # head token differs -> different block, missed
            (5, "Small Ring "),  # normalizes to exact dup of 1 (dist 0)
        ],
        ["id", "name"],
    )
    pairs = {
        (r.id_a, r.id_b): r.dist
        for r in fuzzy_name_pairs(df, "id", "name", max_dist=2).collect()
    }
    assert pairs[(1, 2)] == 1
    assert pairs[(1, 5)] == 0
    assert pairs[(2, 5)] == 1
    assert (1, 3) not in pairs
    # Documented blocking miss: head-token change escapes the block.
    assert all(4 not in p for p in pairs)


def test_fuzzy_max_block_size_drops_hot_blocks(spark):
    rows = [(i, f"mega item{i}") for i in range(10)] + [(100, "tiny x"), (101, "tiny x")]
    df = spark.createDataFrame(rows, ["id", "name"])
    out = fuzzy_name_pairs(df, "id", "name", max_dist=2, max_block_size=5).collect()
    assert {(r.id_a, r.id_b) for r in out} == {(100, 101)}


def test_shared_passage_stats_planted(spark):
    shared = "w0 w1 w2 w3 w4 w5 w6 w7"  # exactly one 8-token chunk
    df = spark.createDataFrame(
        [
            (1, shared + " a1 a2 a3 a4 a5 a6 a7 a8"),  # 2 chunks, 1 shared
            (2, shared),                                # 1 chunk, shared
            (3, "u1 u2 u3 u4 u5 u6 u7 u8"),             # 1 chunk, unique
            (4, "short doc"),                           # 0 chunks
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in shared_passage_stats(df, window_tokens=8).collect()}
    assert (rows[1].n_chunks, rows[1].n_shared, rows[1].shared_frac) == (2, 1, 0.5)
    assert (rows[2].n_chunks, rows[2].n_shared, rows[2].shared_frac) == (1, 1, 1.0)
    assert (rows[3].n_chunks, rows[3].n_shared, rows[3].shared_frac) == (1, 0, 0.0)
    assert (rows[4].n_chunks, rows[4].n_shared, rows[4].shared_frac) == (0, 0, 0.0)


def test_top_ngrams_counts_and_rank(spark):
    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x"), (3, "z")],  # doc 3 too short for bigrams
        ["doc_id", "text"],
    )
    out = top_ngrams(df, n=2, k=3).collect()
    assert [(r.gram, r.cnt, r.rnk) for r in out] == [
        ("a b", 3, 1),
        ("b a", 1, 2),
        ("b c", 1, 3),
    ]
