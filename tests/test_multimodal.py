"""Multimodal plumbing: schema/batch-shape correctness of the mapInPandas
operators (the codec is stubbed; the Spark-side contract is what's tested)."""

from __future__ import annotations

import numpy as np
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


# --- BMP codec: the REAL decode branch (round 6) ----------------------


def _bmp_px():
    import numpy as np

    # 3x2 RGB with distinct channel values; width 3 forces row padding
    # (3*3=9 bytes -> stride 12), the classic BMP decode bug.
    return np.array(
        [
            [[255, 0, 0], [0, 255, 0], [0, 0, 255]],
            [[10, 20, 30], [40, 50, 60], [70, 80, 90]],
        ],
        dtype=np.uint8,
    )


def test_bmp_roundtrip_with_row_padding():
    import numpy as np

    from etl_pipeline_last_fm_spark.operators.multimodal import (
        bmp_decode,
        bmp_encode,
    )

    px = _bmp_px()
    assert np.array_equal(bmp_decode(bmp_encode(px)), px)


def test_bmp_decode_top_down_layout():
    """Negative height = top-down row order; decode must normalize it so
    both layouts yield the same array."""
    import struct

    import numpy as np

    from etl_pipeline_last_fm_spark.operators.multimodal import (
        bmp_decode,
        bmp_encode,
    )

    px = _bmp_px()
    b = bytearray(bmp_encode(px))
    h = struct.unpack_from("<i", b, 22)[0]
    struct.pack_into("<i", b, 22, -h)
    # rows must now be stored top-down: flip the pixel array block
    stride = (px.shape[1] * 3 + 3) // 4 * 4
    rows = [bytes(b[54 + i * stride : 54 + (i + 1) * stride]) for i in range(h)]
    b[54:] = b"".join(reversed(rows))
    assert np.array_equal(bmp_decode(bytes(b)), px)


def test_bmp_decode_rejects_other_depths():
    import struct

    from etl_pipeline_last_fm_spark.operators.multimodal import (
        bmp_decode,
        bmp_encode,
    )

    b = bytearray(bmp_encode(_bmp_px()))
    struct.pack_into("<H", b, 28, 8)  # claim 8-bpp
    with pytest.raises(NotImplementedError, match="24-bpp"):
        bmp_decode(bytes(b))
    with pytest.raises(ValueError, match="magic"):
        bmp_decode(b"not a bitmap")


def test_bmp_resize_nearest_exact():
    """4x4 -> 2x2 nearest-neighbor picks the pixel-center samples —
    hand-checked indices (2i+1)*4//4 = 1,3."""
    import numpy as np

    from etl_pipeline_last_fm_spark.operators.multimodal import (
        bmp_decode,
        bmp_encode,
        bmp_resize_nearest,
    )

    px = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    out = bmp_decode(bmp_resize_nearest(bmp_encode(px), 2, 2))
    assert np.array_equal(out, px[[1, 3]][:, [1, 3]])


def test_image_stats_exact_sums(spark):
    from etl_pipeline_last_fm_spark.operators.multimodal import (
        bmp_encode,
        image_stats,
    )

    px = _bmp_px()
    df = spark.createDataFrame(
        [(1, bmp_encode(px)), (2, b"plain text")],
        "media_id long, content binary",
    )
    [r] = image_stats(df, on_undecodable="skip").collect()
    assert (r.media_id, r.width, r.height, r.n_px) == (1, 3, 2, 6)
    assert (r.sum_r, r.sum_g, r.sum_b) == (
        int(px[:, :, 0].sum()),
        int(px[:, :, 1].sum()),
        int(px[:, :, 2].sum()),
    )
    with pytest.raises(Exception, match="BMP|magic"):
        image_stats(df, on_undecodable="error").collect()


def test_resize_and_features_are_real_for_bmp(spark):
    """fake=False now WORKS on BMP payloads: resize re-encodes a valid
    BMP at the target size, and features come from decoded pixels (a
    uniform gray image -> exact channel means, all mass in one luma
    bin)."""
    import numpy as np

    from etl_pipeline_last_fm_spark.operators.multimodal import (
        FEATURE_DIM,
        bmp_decode,
        bmp_encode,
    )
    from etl_pipeline_last_fm_spark.operators.multimodal import (
        extract_features as ef,
    )

    px = np.full((6, 5, 3), 100, dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, bmp_encode(px), {"modality": "image", "mime": "image/bmp",
                              "width": 5, "height": 6, "duration_ms": None})],
        "media_id long, content binary, meta struct<modality: string, "
        "mime: string, width: int, height: int, duration_ms: int>",
    )
    [rr] = resize(media, 3, 2, fake=False).collect()
    got = bmp_decode(bytes(rr.content))
    assert got.shape == (2, 3, 3) and (got == 100).all()
    assert rr.meta.width == 3 and rr.meta.height == 2

    [fr] = ef(media, fake=False).collect()
    f = fr.feature
    assert len(f) == FEATURE_DIM
    # schema is array<float> (float32): compare at float32 precision
    assert f[:4] == pytest.approx([5.0, 6.0, 5.0 / 6.0, 30.0], rel=1e-6)
    assert f[4:7] == [100.0, 100.0, 100.0]  # channel means, exact
    assert f[7] == 100.0  # luma mean: (299+587+114)*100//1000 = 100
    # luma 100 -> bin 3; all mass there.
    hist = f[8:16]
    assert hist[100 // 32] == 1.0 and sum(hist) == 1.0


# --- WAV codec: the REAL audio decode branch (round 6) ----------------


def _wav_samples():
    import numpy as np

    # Mono ramp crossing zero twice: -3,-1,2,4,-5,6 (int16).
    return np.array([-3, -1, 2, 4, -5, 6], dtype=np.int16)


def test_wav_roundtrip_mono_and_stereo():
    import numpy as np

    from etl_pipeline_last_fm_spark.operators.multimodal import (
        wav_decode,
        wav_encode,
    )

    mono = _wav_samples()
    got, rate = wav_decode(wav_encode(mono, 8000))
    assert rate == 8000 and np.array_equal(got[:, 0], mono)
    stereo = np.stack([mono, -mono], axis=1)
    got2, _ = wav_decode(wav_encode(stereo))
    assert np.array_equal(got2, stereo)


def test_wav_decode_skips_leading_chunks_and_odd_padding():
    """A LIST chunk with ODD size before fmt/data exercises the RIFF
    word-alignment rule — the classic WAV parser bug."""
    import struct

    import numpy as np

    from etl_pipeline_last_fm_spark.operators.multimodal import (
        wav_decode,
        wav_encode,
    )

    mono = _wav_samples()
    b = wav_encode(mono, 8000)
    # splice an odd-sized LIST chunk right after the WAVE tag
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    spliced = b[:12] + junk + b[12:]
    got, rate = wav_decode(spliced)
    assert rate == 8000 and np.array_equal(got[:, 0], mono)


def test_wav_decode_rejects_non_pcm_and_garbage():
    import struct

    import pytest

    from etl_pipeline_last_fm_spark.operators.multimodal import (
        wav_decode,
        wav_encode,
    )

    b = bytearray(wav_encode(_wav_samples()))
    struct.pack_into("<H", b, 20, 85)  # claim MP3 (format 85)
    with pytest.raises(NotImplementedError, match="16-bit PCM"):
        wav_decode(bytes(b))
    with pytest.raises(ValueError, match="RIFF"):
        wav_decode(b"not audio at all")


def test_audio_stats_exact_integers(spark):
    from etl_pipeline_last_fm_spark.operators.multimodal import (
        audio_stats,
        wav_encode,
    )

    mono = _wav_samples()  # |sum|=21, max=6, zc: -1->2, 4->-5, -5->6 = 3
    df = spark.createDataFrame(
        [(1, wav_encode(mono, 8000)), (2, b"junk")],
        "media_id long, content binary",
    )
    [r] = audio_stats(df, on_undecodable="skip").collect()
    assert (r.sample_rate, r.n_channels, r.n_samples) == (8000, 1, 6)
    assert r.duration_ms == 6 * 1000 // 8000 == 0
    assert (r.sum_abs, r.max_abs, r.zero_crossings) == (21, 6, 3)


def test_wav_features_and_sniff(spark):
    import numpy as np

    from etl_pipeline_last_fm_spark.operators.multimodal import (
        FEATURE_DIM,
        sniff_format,
        wav_encode,
    )
    from etl_pipeline_last_fm_spark.operators.multimodal import (
        extract_features as ef,
    )

    mono = np.full(100, 1000, dtype=np.int16)
    media = spark.createDataFrame(
        [(1, wav_encode(mono, 16000), {"modality": "audio", "mime": "audio/wav",
                                       "width": None, "height": None,
                                       "duration_ms": None})],
        "media_id long, content binary, meta struct<modality: string, "
        "mime: string, width: int, height: int, duration_ms: int>",
    )
    [s] = sniff_format(media).select("sniffed").collect()
    assert s.sniffed == "wav"
    [fr] = ef(media, fake=False).collect()
    f = fr.feature
    assert len(f) == FEATURE_DIM
    assert f[:4] == [16000.0, 100.0, 1.0, pytest.approx(100 / 16000)]
    assert f[4] == 1000.0 and f[5] == 1000.0  # mean_abs, peak
    assert f[6] == 0.0 and f[7] == 1000.0  # no crossings; rms of constant
    assert f[8] == 1.0 and sum(f[8:16]) == 1.0  # |1000|//4096 -> bin 0


def test_wav_decode_rejects_truncated_zero_rate_and_short_fmt(spark):
    """The three quarantine escapes caught in review: truncated data
    chunk, rate=0, and a short fmt chunk must all raise ValueError (so
    audio_stats skip-mode quarantines them, not struct/ZeroDivision
    errors crashing the stage)."""
    import struct

    import pytest

    from etl_pipeline_last_fm_spark.operators.multimodal import (
        audio_stats,
        wav_decode,
        wav_encode,
    )

    good = wav_encode(_wav_samples(), 8000)
    with pytest.raises(ValueError, match="truncated WAV"):
        wav_decode(good[:-3])
    zero_rate = bytearray(good)
    struct.pack_into("<I", zero_rate, 24, 0)
    with pytest.raises(ValueError, match="channels/rate"):
        wav_decode(bytes(zero_rate))
    short_fmt = (
        good[:12]
        + b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x01\x00"
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError, match="fmt chunk"):
        wav_decode(short_fmt)
    # and skip-mode quarantines all three instead of crashing
    df = spark.createDataFrame(
        [(1, good[:-3]), (2, bytes(zero_rate)), (3, short_fmt), (4, good)],
        "media_id long, content binary",
    )
    assert [r.media_id for r in audio_stats(df, on_undecodable="skip")
            .collect()] == [4]


# --- PNG codec: the REAL zlib decode branch (round 7) ------------------


def _png_px(channels=3):
    import numpy as np

    rng = np.random.default_rng(7)
    return rng.integers(0, 256, size=(13, 9, channels), dtype=np.uint8)


def test_png_roundtrip_all_filters_rgb_and_rgba():
    """Every PNG scanline filter type (None/Sub/Up/Average/Paeth) must
    unfilter back to the source pixels, for both RGB and RGBA."""
    import numpy as np

    from etl_pipeline_last_fm_spark.operators.multimodal import (
        png_decode,
        png_encode,
    )

    for ch in (3, 4):
        px = _png_px(ch)
        for ft in range(5):
            got = png_decode(png_encode(px, filter_type=ft))
            assert got.shape == px.shape and np.array_equal(got, px), (ch, ft)


def test_png_decode_quarantine_typed_errors():
    """Every malformed-payload path raises ValueError (never zlib.error /
    struct.error) and every needs-a-codec-library variant raises
    NotImplementedError — the image_stats/skip quarantine contract."""
    import struct
    import zlib

    from etl_pipeline_last_fm_spark.operators.multimodal import (
        png_decode,
        png_encode,
    )

    good = png_encode(_png_px())
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"not a png")
    corrupt = bytearray(good)
    corrupt[20] ^= 0xFF  # IHDR body byte -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(corrupt))
    with pytest.raises(ValueError, match="truncated PNG"):
        png_decode(good[: len(good) - 20])  # cut into IDAT

    def rewrite_ihdr(offset, value):
        b = bytearray(good)
        b[offset] = value
        body = bytes(b[16:29])
        b[29:33] = struct.pack(">I", zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF)
        return bytes(b)

    # The decoder is now COMPLETE over legal IHDRs, so flag rewrites that
    # don't re-lay-out the pixel data are MALFORMED payloads (length /
    # PLTE errors), not unsupported formats.
    with pytest.raises(ValueError, match="length mismatch|filter type"):
        png_decode(rewrite_ihdr(28, 1))  # Adam7 flag, non-interlaced data
    with pytest.raises(ValueError, match="length mismatch|filter type"):
        png_decode(rewrite_ihdr(24, 16))  # 16-bit flag, 8-bit data
    with pytest.raises(ValueError, match="length mismatch|filter type"):
        png_decode(rewrite_ihdr(25, 3))  # palette flag over 3-channel data
    with pytest.raises(ValueError, match="illegal"):
        png_decode(rewrite_ihdr(24, 3))  # depth 3 exists for no color type

    # zlib-corrupt IDAT body behind a FIXED CRC -> ValueError, not zlib.error
    b = bytearray(good)
    pos = 8
    while bytes(b[pos + 4 : pos + 8]) != b"IDAT":
        pos += 12 + struct.unpack_from(">I", b, pos)[0]
    ln = struct.unpack_from(">I", b, pos)[0]
    b[pos + 8] ^= 0xFF
    body = bytes(b[pos + 8 : pos + 8 + ln])
    b[pos + 8 + ln : pos + 12 + ln] = struct.pack(
        ">I", zlib.crc32(b"IDAT" + body) & 0xFFFFFFFF
    )
    with pytest.raises(ValueError, match="IDAT"):
        png_decode(bytes(b))


def test_image_stats_mixes_bmp_and_png_and_ignores_alpha(spark):
    """image_stats now routes by magic bytes: BMP and PNG rows both decode
    in one pass; RGBA alpha is excluded from the channel sums."""
    import numpy as np

    from etl_pipeline_last_fm_spark.operators.multimodal import (
        bmp_encode,
        image_stats,
        png_encode,
    )

    bmp_px = _bmp_px()
    rgba = np.dstack([_png_px(3), np.full((13, 9), 7, dtype=np.uint8)])
    df = spark.createDataFrame(
        [(1, bmp_encode(bmp_px)), (2, png_encode(rgba)), (3, b"junk")],
        "media_id long, content binary",
    )
    rows = {r.media_id: r for r in image_stats(df, on_undecodable="skip").collect()}
    assert set(rows) == {1, 2}
    assert (rows[2].width, rows[2].height, rows[2].n_px) == (9, 13, 117)
    assert (rows[2].sum_r, rows[2].sum_g, rows[2].sum_b) == tuple(
        int(rgba[:, :, i].sum()) for i in range(3)
    )
    with pytest.raises(Exception, match="BMP, PNG, JPEG, or GIF"):
        image_stats(df, on_undecodable="error").collect()


def test_resize_and_features_are_real_for_png(spark):
    """fake=False works on PNG payloads: resize decodes + nearest-samples
    + re-encodes as PNG, and extract_features on a PNG equals
    extract_features on a BMP of the SAME pixels (format-independent)."""
    import numpy as np

    from etl_pipeline_last_fm_spark.operators.multimodal import (
        bmp_encode,
        extract_features,
        png_decode,
        png_encode,
    )

    px = _png_px(3)
    schema = (
        "media_id long, content binary, meta struct<modality: string, "
        "mime: string, width: int, height: int, duration_ms: int>"
    )
    meta = {"modality": "image", "mime": "image/png",
            "width": 9, "height": 13, "duration_ms": None}
    media = spark.createDataFrame([(1, png_encode(px), meta)], schema)
    [rr] = resize(media, 3, 4, fake=False).collect()
    content = bytes(rr.content)
    assert content[:8] == b"\x89PNG\r\n\x1a\n"  # stays PNG
    got = png_decode(content)
    ri = ((2 * np.arange(4) + 1) * 13) // 8
    ci = ((2 * np.arange(3) + 1) * 9) // 6
    assert np.array_equal(got, px[ri][:, ci])

    both = spark.createDataFrame(
        [(1, png_encode(px), meta), (2, bmp_encode(px), meta)], schema
    )
    feats = {r.media_id: r.feature for r in
             extract_features(both, fake=False).collect()}
    assert feats[1] == feats[2]
    assert len(feats[1]) == FEATURE_DIM


# --- AVI codec: the REAL video decode branch (round 7) -----------------


def _avi_frames():
    import numpy as np

    rng = np.random.default_rng(3)
    # width 6 -> 18-byte rows -> stride 20: the DIB padding path is live
    return rng.integers(0, 256, size=(7, 5, 6, 3), dtype=np.uint8)


def test_avi_roundtrip_and_sniff():
    import numpy as np

    from etl_pipeline_last_fm_spark.operators.multimodal import (
        avi_decode,
        avi_encode,
    )

    frames = _avi_frames()
    got, fps = avi_decode(avi_encode(frames, fps=12))
    assert fps == 12 and np.array_equal(got, frames)


def test_avi_decode_quarantine_typed_errors():
    import struct

    from etl_pipeline_last_fm_spark.operators.multimodal import (
        avi_decode,
        avi_encode,
    )

    good = avi_encode(_avi_frames())
    with pytest.raises(ValueError, match="RIFF/AVI magic"):
        avi_decode(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError, match="truncated AVI"):
        avi_decode(good[:-30])
    # An inter-frame codec fourcc (XVID) stays NotImplementedError...
    xvid = bytearray(good)
    i = bytes(xvid).find(b"strf")
    struct.pack_into("<I", xvid, i + 8 + 16, 0x44495658)  # biCompression=XVID
    with pytest.raises(NotImplementedError, match="BI_RGB"):
        avi_decode(bytes(xvid))
    # ...while an MJPG flag over non-JPEG frame bytes is now a MALFORMED
    # payload (the MJPG path is real, operators/jpeg.py): ValueError.
    mjpg = bytearray(good)
    struct.pack_into("<I", mjpg, i + 8 + 16, 0x47504A4D)  # biCompression=MJPG
    with pytest.raises(ValueError, match="not a JPEG payload"):
        avi_decode(bytes(mjpg))


def test_avi_mjpg_roundtrip_and_frame_sample():
    """The COMPRESSED real video path: MJPG frames ride the baseline-JPEG
    codec, decode near-losslessly at high quality, and frame_sample's
    picks land on the same frames as the raw codec's."""
    import numpy as np

    from etl_pipeline_last_fm_spark.operators.multimodal import (
        avi_decode,
        avi_encode,
    )

    rng = np.random.default_rng(11)
    # Smooth frames (JPEG-friendly): per-frame shifted gradients.
    y, x = np.mgrid[0:16, 0:24]
    frames = np.stack(
        [
            np.stack(
                [
                    (x * 255 // 24 + 9 * t) % 256,
                    (y * 255 // 16 + 5 * t) % 256,
                    ((x + y) * 255 // 40) % 256,
                ],
                axis=-1,
            )
            for t in range(5)
        ]
    ).astype(np.uint8)
    enc = avi_encode(frames, fps=8, codec="mjpg", quality=95)
    got, fps = avi_decode(enc)
    assert fps == 8 and got.shape == frames.shape
    err = np.abs(got.astype(int) - frames.astype(int))
    assert err.mean() < 4 and err.max() < 48  # lossy but close at q95
    # Deterministic encode (the idempotence contract every codec keeps).
    assert enc == avi_encode(frames, fps=8, codec="mjpg", quality=95)


def test_frame_sample_real_for_avi_composes_with_image_tier(spark):
    """frame_sample's real path: sampled AVI frames come out as
    standalone BMPs at the exact pixel-center picks, and flow straight
    into image_stats (the codec arc composing end-to-end)."""
    import numpy as np

    from etl_pipeline_last_fm_spark.operators.multimodal import (
        avi_encode,
        bmp_decode,
        frame_sample,
        image_stats,
        sniff_format,
    )

    frames = _avi_frames()
    df = spark.createDataFrame(
        [(1, avi_encode(frames, fps=12))], "media_id long, content binary"
    )
    [sniffed] = sniff_format(df).select("sniffed").collect()
    assert sniffed.sniffed == "avi"

    out = frame_sample(df, n_frames=3, fake=False).collect()
    picks = ((2 * np.arange(3) + 1) * 7) // 6
    assert [(r.media_id, r.frame_idx) for r in out] == [(1, 0), (1, 1), (1, 2)]
    for r, p in zip(out, picks):
        assert np.array_equal(bmp_decode(bytes(r.frame)), frames[int(p)])

    stats = image_stats(
        frame_sample(df, n_frames=3, fake=False)
        .select(F.col("frame_idx").cast("long").alias("media_id"),
                F.col("frame").alias("content"))
    ).collect()
    assert len(stats) == 3 and all(r.n_px == 30 for r in stats)


def test_frame_sample_non_avi_raises_and_fake_still_works(spark):
    from etl_pipeline_last_fm_spark.operators.multimodal import frame_sample

    df = spark.createDataFrame(
        [(1, b"not a video")], "media_id long, content binary"
    )
    with pytest.raises(Exception, match="codec libraries"):
        frame_sample(df, n_frames=2, fake=False).collect()
    assert len(frame_sample(df, n_frames=2, fake=True).collect()) == 2


def test_avi_with_audio_stream_and_deep_nesting():
    """Two parser hardening cases: (1) an audio strl after the video one
    (the layout real muxers emit) must NOT overwrite the video strf —
    decode still succeeds; (2) a crafted deeply-nested LIST tree raises
    the quarantine ValueError, never a RecursionError."""
    import struct

    import numpy as np

    from etl_pipeline_last_fm_spark.operators.multimodal import (
        _avi_parse,
        avi_decode,
        avi_encode,
    )

    frames = _avi_frames()
    b = avi_encode(frames, fps=12)

    def chunk(tag, body):
        pad = b"\x00" if len(body) & 1 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    def lst(kind, body):
        return chunk(b"LIST", kind + body)

    astrh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh", b"auds", b"\x00" * 4,
        0, 0, 0, 0, 1, 8000, 0, 100, 0, 0, 0, 0, 0, 0, 0,
    )
    astrf = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16) + b"\x00\x00"
    audio_strl = lst(b"strl", chunk(b"strh", astrh) + chunk(b"strf", astrf))
    li = b.rfind(b"LIST", 0, b.find(b"hdrl"))
    lsz = struct.unpack_from("<I", b, li + 4)[0]
    body_end = li + 8 + lsz
    spliced = bytearray(b[:body_end])
    spliced[li + 4 : li + 8] = struct.pack("<I", lsz + len(audio_strl))
    spliced += audio_strl + b[body_end:]
    spliced[4:8] = struct.pack("<I", len(spliced) - 8)
    got, fps = avi_decode(bytes(spliced))
    assert fps == 12 and np.array_equal(got, frames)

    nested = b"junk" + struct.pack("<I", 0)
    for _ in range(30):
        nested = b"LIST" + struct.pack("<I", 4 + len(nested)) + b"knd " + nested
    payload = b"RIFF" + struct.pack("<I", 4 + len(nested)) + b"AVI " + nested
    with pytest.raises(ValueError, match="nesting exceeds"):
        _avi_parse(payload)


# --- PNG completion (round 7): every legal IHDR decodes ----------------


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body)) + tag + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _png_raw(w, h, depth, color, interlace, idat_raw, extra=b""):
    """Hand-built PNG from the spec — fixtures for layouts the 8-bit
    RGB(A) encoder doesn't emit."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    return (
        b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr) + extra
        + _png_chunk(b"IDAT", zlib.compress(idat_raw))
        + _png_chunk(b"IEND", b"")
    )


def test_png_grayscale_depths_and_alpha():
    import numpy as np

    from etl_pipeline_last_fm_spark.operators.multimodal import png_decode

    rng = np.random.default_rng(5)
    # 8-bit gray replicates into RGB.
    g = rng.integers(0, 256, (4, 5), np.uint8)
    raw = b"".join(b"\x00" + g[r].tobytes() for r in range(4))
    dec = png_decode(_png_raw(5, 4, 8, 0, 0, raw))
    assert dec.shape == (4, 5, 3)
    for c in range(3):
        assert np.array_equal(dec[:, :, c], g)
    # 1-bit gray scales 0/1 -> 0/255 (10 px -> 2 packed bytes + padding).
    bits = rng.integers(0, 2, (3, 10), np.uint8)
    raw = b"".join(
        b"\x00" + np.packbits(bits[r], bitorder="big").tobytes()
        for r in range(3)
    )
    assert np.array_equal(
        png_decode(_png_raw(10, 3, 1, 0, 0, raw))[:, :, 0], bits * 255
    )
    # 4-bit gray scales by 17.
    v4 = rng.integers(0, 16, (2, 5), np.uint8)
    rows = []
    for r in range(2):
        b = bytearray()
        for i in range(0, 5, 2):
            b.append((v4[r, i] << 4) | (v4[r, i + 1] if i + 1 < 5 else 0))
        rows.append(b"\x00" + bytes(b))
    assert np.array_equal(
        png_decode(_png_raw(5, 2, 4, 0, 0, b"".join(rows)))[:, :, 0], v4 * 17
    )
    # gray + alpha -> (h, w, 4) with gray replicated.
    ga = rng.integers(0, 256, (3, 4, 2), np.uint8)
    raw = b"".join(b"\x00" + ga[r].tobytes() for r in range(3))
    dec = png_decode(_png_raw(4, 3, 8, 4, 0, raw))
    assert dec.shape == (3, 4, 4)
    assert np.array_equal(dec[:, :, 0], ga[:, :, 0])
    assert np.array_equal(dec[:, :, 3], ga[:, :, 1])


def test_png_16bit_high_byte():
    import numpy as np

    from etl_pipeline_last_fm_spark.operators.multimodal import png_decode

    rng = np.random.default_rng(6)
    px16 = rng.integers(0, 65536, (3, 4, 3)).astype(">u2")
    raw = b"".join(b"\x00" + px16[r].tobytes() for r in range(3))
    dec = png_decode(_png_raw(4, 3, 16, 2, 0, raw))
    assert np.array_equal(dec, (px16 >> 8).astype(np.uint8))


def test_png_palette_trns_and_subbyte_indices():
    import numpy as np

    from etl_pipeline_last_fm_spark.operators.multimodal import png_decode

    rng = np.random.default_rng(7)
    pal = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]], np.uint8
    )
    plte = _png_chunk(b"PLTE", pal.tobytes())
    idx = rng.integers(0, 4, (4, 6), np.uint8)
    raw = b"".join(b"\x00" + idx[r].tobytes() for r in range(4))
    # Without tRNS: RGB; with a 2-entry tRNS: RGBA with table alpha.
    assert np.array_equal(
        png_decode(_png_raw(6, 4, 8, 3, 0, raw, extra=plte)), pal[idx]
    )
    dec = png_decode(
        _png_raw(6, 4, 8, 3, 0, raw,
                 extra=plte + _png_chunk(b"tRNS", bytes([10, 20])))
    )
    assert np.array_equal(dec[:, :, :3], pal[idx])
    want_a = np.where(idx == 0, 10, np.where(idx == 1, 20, 255))
    assert np.array_equal(dec[:, :, 3], want_a)
    # 2-bit palette indices (sub-byte unpack path), out-of-range raises.
    idx2 = rng.integers(0, 4, (3, 7), np.uint8)
    rows = []
    for r in range(3):
        bits2 = np.unpackbits(idx2[r][:, None], axis=1, bitorder="big")[
            :, 6:8
        ].reshape(-1)
        bits2 = np.concatenate(
            [bits2, np.zeros((-len(bits2)) % 8, np.uint8)]
        )
        rows.append(b"\x00" + np.packbits(bits2, bitorder="big").tobytes())
    assert np.array_equal(
        png_decode(_png_raw(7, 3, 2, 3, 0, b"".join(rows), extra=plte)),
        pal[idx2],
    )
    short_pal = _png_chunk(b"PLTE", pal[:2].tobytes())
    with pytest.raises(ValueError, match="palette index out of range"):
        png_decode(_png_raw(6, 4, 8, 3, 0, raw, extra=short_pal))


def test_png_adam7_interlace_exact():
    """Adam7 fixtures hand-scattered with the SPEC's pass table written
    out independently — decode must reassemble the exact image, on the
    all-passes 8x8 and on odd sizes where trailing passes are empty."""
    import numpy as np

    from etl_pipeline_last_fm_spark.operators.multimodal import png_decode

    passes = [
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    ]
    rng = np.random.default_rng(8)
    for h, w in [(8, 8), (3, 5), (1, 1), (2, 9)]:
        full = rng.integers(0, 256, (h, w, 3), np.uint8)
        raws = []
        for x0, y0, dx, dy in passes:
            sub = full[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            for r in range(sub.shape[0]):
                raws.append(b"\x00" + sub[r].tobytes())
        dec = png_decode(_png_raw(w, h, 8, 2, 1, b"".join(raws)))
        assert np.array_equal(dec, full), (h, w)


def _block_video(n=6, h=40, w=64):
    fr = np.zeros((n, h, w, 3), np.uint8)
    fr[:, :, :] = [10, 20, 30]
    for k in range(n):
        fr[k, 5:15, 5 + 6 * k : 15 + 6 * k] = [200, 50, 50]
    return fr


def test_rle8_avi_roundtrip_and_compression():
    """Inter-coded RLE8 AVI: lossless round-trip through the container,
    and the static background actually compresses (unwritten pixels
    persist from the previous frame — the inter-frame path is real)."""
    from etl_pipeline_last_fm_spark.operators.multimodal import (
        avi_decode,
        avi_encode,
    )

    fr = _block_video()
    b = avi_encode(fr, fps=5, codec="rle8")
    assert len(b) < fr.size // 10  # delta coding pays off
    got, fps = avi_decode(b)
    assert fps == 5
    assert np.array_equal(got, fr)


def test_avi_buffer_size_metadata_matches_codec():
    """ADVICE r7: compressed streams must not advertise the 24-bpp DIB
    size. rle8's strh dwSuggestedBufferSize == largest encoded chunk and
    strf biSizeImage == the decoded 8-bpp row-padded DIB; mjpg's
    suggested buffer == largest encoded JPEG; raw keeps the exact DIB
    size in both."""
    import struct

    from etl_pipeline_last_fm_spark.operators.multimodal import avi_encode

    fr = _block_video()
    n, h, w = fr.shape[:3]
    dib24 = (w * 3 + 3) // 4 * 4 * h

    def fields(b):
        strh_off = b.index(b"strh") + 8
        sug = struct.unpack_from("<I", b, strh_off + 36)[0]
        strf_off = b.index(b"strf") + 8
        size_image = struct.unpack_from("<I", b, strf_off + 20)[0]
        # the movi chunk bodies, for the true max encoded size
        sizes, pos = [], b.index(b"movi") + 4
        while pos + 8 <= len(b):
            tag, ln = b[pos : pos + 4], struct.unpack_from("<I", b, pos + 4)[0]
            if tag in (b"00db", b"00dc"):
                sizes.append(ln)
            pos += 8 + ln + (ln & 1)
        return sug, size_image, max(sizes)

    sug, size_image, biggest = fields(avi_encode(fr, fps=5, codec="rle8"))
    assert sug == biggest and sug < dib24
    assert size_image == (w + 3) // 4 * 4 * h
    sug, size_image, biggest = fields(avi_encode(fr, fps=5, codec="mjpg"))
    assert sug == biggest
    sug, size_image, biggest = fields(avi_encode(fr, fps=5, codec="raw"))
    assert sug == size_image == biggest == dib24


def test_rle8_frame_decode_modes_and_quarantine():
    """Per-frame codec surface: keyframe vs delta decode, absolute-mode
    word padding, and the ValueError quarantine on truncation and
    out-of-bounds runs."""
    import pytest

    from etl_pipeline_last_fm_spark.operators.rle8 import (
        rle8_decode_frame,
        rle8_encode_frame,
    )

    rng = np.random.default_rng(11)
    prev = rng.integers(0, 6, (9, 13), np.uint8)
    cur = prev.copy()
    cur[2, 3:8] = 7  # a changed span mid-row
    cur[5] = np.arange(13) % 5  # a fully-rewritten literal-ish row
    data = rle8_encode_frame(cur, prev)
    assert np.array_equal(rle8_decode_frame(data, 13, 9, prev), cur)
    # keyframe path: unwritten pixels default to 0
    key = rle8_encode_frame(cur, None)
    assert np.array_equal(rle8_decode_frame(key, 13, 9, None), cur)
    with pytest.raises(ValueError, match="truncated"):
        rle8_decode_frame(data[:-2], 13, 9, prev)
    with pytest.raises(ValueError, match="bounds"):
        rle8_decode_frame(bytes((255, 1, 0, 1)), 13, 9, prev)  # run past w
    from etl_pipeline_last_fm_spark.operators.rle8 import build_palette

    with pytest.raises(ValueError, match="256"):
        g = np.zeros((1, 20, 20, 3), np.uint8)
        g[0, :, :, 0] = (np.arange(400) % 256).reshape(20, 20)
        g[0, :, :, 1] = (np.arange(400) // 256 * 7).reshape(20, 20)
        build_palette(g)


def test_frame_sample_rle8_sequential_dependency(spark):
    """frame_sample on an inter-coded RLE8 AVI: sampled frames equal the
    fully-decoded frames at the same pixel-center picks (the sequential
    0..k decode is exercised because later frames differ from frame 0)."""
    from etl_pipeline_last_fm_spark.operators.multimodal import (
        avi_decode,
        avi_encode,
        bmp_decode,
        frame_sample,
    )

    fr = _block_video()
    b = avi_encode(fr, fps=5, codec="rle8")
    df = spark.createDataFrame(
        [(1, bytearray(b))], "media_id long, content binary"
    )
    picked = frame_sample(df, n_frames=3, fake=False).collect()
    full, _ = avi_decode(b)
    n = full.shape[0]
    picks = ((2 * np.arange(3) + 1) * n) // (2 * 3)
    for r in picked:
        assert np.array_equal(
            bmp_decode(bytes(r["frame"])), full[int(picks[r["frame_idx"]])]
        )
