"""Multimodal plumbing: schema/batch-shape correctness of the mapInPandas
operators (the codec is stubbed; the Spark-side contract is what's tested)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_last_fm_spark.operators.multimodal import (
    FEATURE_DIM,
    attach_binary,
    extract_features,
    frame_sample,
    resize,
)
from etl_pipeline_last_fm_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    return attach_binary(docs)


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "content", "meta"]
    meta_fields = [f.name for f in media.schema["meta"].dataType.fields]
    assert meta_fields == ["modality", "mime", "width", "height", "duration_ms"]


def test_extract_features_deterministic_across_batch_sizes(spark, media):
    # Force multiple small Arrow batches — the UDF must be batch-agnostic.
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        a = {r.media_id: r.feature for r in extract_features(media, fake=True).collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    b = {r.media_id: r.feature for r in extract_features(media, fake=True).collect()}
    assert a == b
    assert all(len(v) == FEATURE_DIM for v in a.values())


def test_resize_updates_meta_and_content_shape(media):
    out = resize(media, 8, 6, fake=True)
    rows = out.collect()
    assert len(rows) == 40
    assert all(len(bytes(r.content)) == 48 for r in rows)
    assert all(r.meta.width == 8 and r.meta.height == 6 for r in rows)
    # modality metadata passes through untouched
    assert all(r.meta.modality == "image" for r in rows)


def test_frame_sample_is_flatmap_shaped(media):
    out = frame_sample(media, n_frames=3, fake=True)
    rows = out.collect()
    assert len(rows) == 120  # 40 media x 3 frames
    per = {}
    for r in rows:
        per.setdefault(r.media_id, set()).add(r.frame_idx)
    assert all(v == {0, 1, 2} for v in per.values())
    # frames deterministic: same content + idx -> same bytes
    again = {(r.media_id, r.frame_idx): bytes(r.frame) for r in frame_sample(media, 3, fake=True).collect()}
    assert all(again[(r.media_id, r.frame_idx)] == bytes(r.frame) for r in rows)


def test_stub_raises_without_fake(media):
    import py4j

    with pytest.raises(Exception) as ei:
        resize(media, 4, 4, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or "resize" in str(ei.value)


def test_sniff_format_magic_bytes(spark):
    """Crafted headers classify correctly; the sniff is pure expression
    (no Python eval nodes) and stays JVM-side."""
    from etl_pipeline_last_fm_spark.operators.multimodal import sniff_format

    payloads = [
        (1, bytes.fromhex("FFD8FF") + b"rest-of-jpeg", "jpeg"),
        (2, bytes.fromhex("89504E47") + b"png-body", "png"),
        (3, b"GIF89a...", "gif"),
        (4, b"RIFF" + b"\x00" * 8, "riff"),
        (5, b"%PDF-1.7", "pdf"),
        (6, b"ID3\x04tag", "mp3"),
        (7, b"\x00\x00\x00\x20ftypisom", "mp4"),
        (8, b"plain text bytes", "unknown"),
        (9, b"", "unknown"),
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c, _ in payloads], "media_id long, content binary"
    )
    got = {r["media_id"]: (r["sniffed"], r["n_bytes"]) for r in sniff_format(df).collect()}
    for i, c, want in payloads:
        assert got[i] == (want, len(c)), (i, got[i])

    plan = sniff_format(df)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
