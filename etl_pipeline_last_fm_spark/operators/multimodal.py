"""Multimodal column plumbing: opaque binary content + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct (modality, mime, width/height/duration...). The Spark-side
plumbing — schema, partition-friendly layout, Arrow-batched UDF signatures,
batch shapes — is real and tested; the actual codec step is STUBBED because
decode libraries (PIL/ffmpeg/etc.) are not in this container:

- ``decode_stub_features`` raises NotImplementedError by default, or emits a
  DETERMINISTIC FAKE feature vector (seeded by content hash) when
  ``fake=True`` so downstream plumbing (similarity search over the features)
  is exercisable end-to-end.

At scale this is the canonical ``mapInPandas`` pattern: Arrow batches of
binary payloads flow to Python once, the UDF is the only Python hop, and the
output schema is declared so Catalyst keeps optimizing around it.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, content binary, "
    "meta struct<modality: string, mime: string, width: int, height: int, duration_ms: int>"
)

FEATURE_DIM = 16
FEATURES_SCHEMA = f"media_id long, feature array<float>, n_bytes long"


def attach_binary(docs: DataFrame, id_col: str = "doc_id", payload_col: str = "text") -> DataFrame:
    """Build a media table from any source column by treating its bytes as
    opaque content (stand-in for real image/audio payloads)."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(payload_col), "UTF-8").alias("content"),
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


# Magic-byte signatures: (label, hex prefix, byte offset). Pure-expression
# sniffing — no codec library involved, so unlike the decode stubs this is
# REAL functionality: the triage step a 100 TB media crawl runs first
# (route by container format, quarantine unknowns) costs one substring
# compare per row, JVM-side.
_MAGIC = [
    ("jpeg", "FFD8FF", 0),
    ("png", "89504E47", 0),
    ("gif", "474946", 0),
    ("riff", "52494646", 0),  # WAV/AVI/WebP share the RIFF container
    ("pdf", "25504446", 0),
    ("mp3", "494433", 0),  # ID3-tagged
    ("mp4", "66747970", 4),  # 'ftyp' after the 4-byte box length
]


def sniff_format(
    media: DataFrame, content_col: str = "content"
) -> DataFrame:
    """Add ``sniffed`` (container label or 'unknown') + ``n_bytes`` from
    magic-byte prefixes of the binary column — decode-free triage."""
    expr = F.lit("unknown")
    for label, sig, off in reversed(_MAGIC):
        prefix = F.hex(
            F.substring(F.col(content_col), off + 1, len(sig) // 2)
        )
        expr = F.when(prefix == F.lit(sig), F.lit(label)).otherwise(expr)
    return media.withColumn("sniffed", expr).withColumn(
        "n_bytes", F.length(F.col(content_col)).cast("long")
    )


def _fake_features(content: bytes) -> list[float]:
    """Deterministic fake 'decoded' features: seeded by the content digest,
    so results are stable across runs/executors. CLEARLY A STUB."""
    seed = int.from_bytes(hashlib.sha256(content).digest()[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(FEATURE_DIM).astype("float32").tolist()


def resize(media: DataFrame, width: int, height: int, fake: bool = False) -> DataFrame:
    """Resize stub: same schema out as in, meta.width/height updated.

    The Spark plumbing (Arrow batches of binary + nested meta struct through
    mapInPandas, declared output schema) is real; the codec call is the stub.
    With ``fake=True`` the 'resized' content is a deterministic digest-seeded
    byte string of length width*height — stable across executors/retries."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image resize requires codec libraries not present in this "
                    "environment; pass fake=True for the deterministic stub"
                )
            out_content = []
            for c in pdf["content"]:
                seed = hashlib.sha256(bytes(c) + f"|{width}x{height}".encode()).digest()
                reps = (width * height) // len(seed) + 1
                out_content.append((seed * reps)[: width * height])
            meta = [
                {**(m if isinstance(m, dict) else m.asDict() if hasattr(m, "asDict") else dict(m)),
                 "width": width, "height": height}
                for m in pdf["meta"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "content": out_content, "meta": meta}
            )

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def frame_sample(media: DataFrame, n_frames: int = 4, fake: bool = False) -> DataFrame:
    """Frame sampling stub: one input 'video' -> n_frames output rows
    (media_id, frame_idx, frame) — the flatMap-shaped UDTF pattern through
    mapInPandas (output row count independent of input row count)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video decode requires codec libraries not present in this "
                    "environment; pass fake=True for the deterministic stub"
                )
            ids, idxs, frames = [], [], []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(hashlib.sha256(bytes(c) + f"|frame{i}".encode()).digest())
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.select("media_id", "content").mapInPandas(
        run, schema="media_id long, frame_idx int, frame binary"
    )


def extract_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + featurize via mapInPandas (Arrow-batched; the one legitimate
    Python hop). With ``fake=False`` this raises NotImplementedError at
    execution time — the real decoder belongs here.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires codec libraries not present in this "
                    "environment; pass fake=True for the deterministic stub"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": [_fake_features(bytes(c)) for c in pdf["content"]],
                    "n_bytes": [len(bytes(c)) for c in pdf["content"]],
                }
            )

    return media.select("media_id", "content").mapInPandas(run, schema=FEATURES_SCHEMA)
