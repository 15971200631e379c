"""FLAC codec (operators/flac.py): lossless round-trips across every
encoder mode, decoder coverage of streams the encoder doesn't emit
(raw-bits escape partitions), integrity checks (CRC-8/16, MD5), the
quarantine contract (malformed → ValueError, non-16-bit →
NotImplementedError), and the Spark-side routing (audio_stats /
extract_features treat a WAV and its FLAC transcode identically)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from etl_pipeline_last_fm_spark.operators.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_number,
    flac_decode,
    flac_encode,
)

RNG = np.random.default_rng(20260815)


def _tone(n: int, ch: int = 1) -> np.ndarray:
    t = np.arange(n)
    base = 3000 * np.sin(t * 0.05) + 500 * np.sin(t * 0.21)
    cols = [base + 100 * i + RNG.integers(-20, 20, n) for i in range(ch)]
    x = np.stack(cols, axis=1).astype(np.int16)
    return x[:, 0] if ch == 1 else x


def _rt(x: np.ndarray, rate: int = 16_000, **kw) -> bytes:
    b = flac_encode(x, rate, **kw)
    y, r = flac_decode(b)
    want = x if x.ndim == 2 else x[:, None]
    assert r == rate
    assert np.array_equal(y, want)
    return b


def test_roundtrip_noise_tones_constant_short():
    _rt(RNG.integers(-32768, 32768, 5000, dtype=np.int16))  # incompressible
    b = _rt(_tone(20000))
    assert len(b) < 20000  # LPC actually compresses the tonal signal
    _rt(np.full(3000, -123, dtype=np.int16))
    _rt(np.array([7], dtype=np.int16))
    _rt(np.array([1, -2, 3], dtype=np.int16))


def test_roundtrip_every_stereo_mode_and_channels():
    s = _tone(9000, ch=2)
    for mode in ("independent", "left_side", "right_side", "mid_side", "auto"):
        _rt(s, stereo_mode=mode)
    _rt(RNG.integers(-2000, 2000, (4000, 3), dtype=np.int16))
    _rt(_tone(2500, ch=2), rate=44_100)
    _rt(_tone(2500), rate=12_345)  # non-table rate (16-bit Hz escape)


def test_roundtrip_partition_orders_and_block_sizes():
    s = _tone(8192, ch=2)
    for po in (0, 1, 2, 4):
        _rt(s, partition_order=po)
    _rt(s, block_size=1000)  # non-table block size + short last block
    _rt(s, block_size=192)
    _rt(_tone(8192), use_lpc=False)


def test_extreme_amplitudes_survive_side_channel():
    # full-scale anticorrelated stereo maxes the 17-bit side channel
    l = RNG.choice(np.array([-32768, 32767], dtype=np.int16), 4000)
    s = np.stack([l, -l - 1], axis=1).astype(np.int16)
    for mode in ("left_side", "right_side", "mid_side"):
        _rt(s, stereo_mode=mode)


def test_corruption_is_detected():
    b = bytearray(flac_encode(_tone(4000), 16_000))
    b[len(b) // 2] ^= 0x40  # flip a bit mid-frame
    with pytest.raises(ValueError):
        flac_decode(bytes(b))
    with pytest.raises(ValueError, match="fLaC magic"):
        flac_decode(b"not audio")
    with pytest.raises(ValueError):
        flac_decode(flac_encode(_tone(4000), 16_000)[:-40])  # truncated


def test_non_16bit_raises_notimplemented():
    b = bytearray(flac_encode(_tone(100), 16_000))
    # STREAMINFO bits-per-sample-1 is 5 bits straddling bytes 20-21 of
    # the file (header 8 + min/max block 4 + frame sizes 6 + rate 2.5):
    # patch via re-synthesized STREAMINFO instead of bit surgery.
    si = b[8:42]
    # byte 12 of STREAMINFO holds rate[3:0] | ch[2:0] | bps[4]; byte 13
    # has bps[3:0] in its top nibble. bps-1=15 -> set to 23 (24-bit).
    raw = bytearray(si)
    raw[12] = (raw[12] & 0xFE) | ((23 >> 4) & 1)
    raw[13] = ((23 & 0xF) << 4) | (raw[13] & 0x0F)
    b[8:42] = raw
    with pytest.raises(NotImplementedError, match="16-bit"):
        flac_decode(bytes(b))


def test_unknown_total_samples_decodes_to_exhaustion():
    """RFC 9639 §8.2: STREAMINFO total_samples == 0 means UNKNOWN and an
    all-zero MD5 means UNSET (ADVICE r7). Zero both fields in a real
    stream; the decoder must decode every frame to payload exhaustion
    and skip the MD5 check, returning the full signal."""
    x = _tone(5000, ch=2)
    b = bytearray(flac_encode(x, 16_000, block_size=1000))
    # STREAMINFO body is file bytes 8..41. total_samples(36) occupies
    # the low nibble of body byte 13 + body bytes 14-17; MD5 is body
    # bytes 18-33.
    b[8 + 13] &= 0xF0
    for i in range(14, 18):
        b[8 + i] = 0
    for i in range(18, 34):
        b[8 + i] = 0
    y, r = flac_decode(bytes(b))
    assert r == 16_000
    assert np.array_equal(y, x)
    # ...and a REAL MD5 with unknown total still verifies (and a corrupt
    # payload under unknown total is still caught by the frame CRCs).
    b2 = bytearray(flac_encode(x, 16_000, block_size=1000))
    b2[8 + 13] &= 0xF0
    for i in range(14, 18):
        b2[8 + i] = 0
    y2, _ = flac_decode(bytes(b2))
    assert np.array_equal(y2, x)
    b2[len(b2) // 2] ^= 0x40
    with pytest.raises(ValueError):
        flac_decode(bytes(b2))


def test_escape_partition_decodes():
    """The encoder never emits the raw-bits escape; hand-build a frame
    with one escaped partition (verbatim-coded residual bits) and check
    the decoder reads it exactly."""
    samples = np.array([5, -3, 12, 0, -8, 1, 2, -1], dtype=np.int16)
    n = len(samples)
    hdr = _BitWriter()
    hdr.write(0b11111111111110, 14)
    hdr.write(0, 2)
    hdr.write(0b0110, 4)   # 8-bit block size follows
    hdr.write(0b0101, 4)   # 16 kHz
    hdr.write(0, 4)        # 1 channel
    hdr.write(0b100, 3)    # 16-bit
    hdr.write(0, 1)
    hdr.align()
    head = hdr.getvalue() + _utf8_number(0) + struct.pack("B", n - 1)
    head += bytes([_crc8(head)])
    body = _BitWriter()
    body.write(0, 1)
    body.write(0b001000, 6)  # fixed order 0
    body.write(0, 1)
    body.write(0, 2)          # rice method 0
    body.write(0, 4)          # partition order 0
    body.write(0b1111, 4)     # ESCAPE
    body.write(16, 5)         # 16 raw bits per residual
    for v in samples:
        body.write(int(v) & 0xFFFF, 16)
    body.align()
    frame = head + body.getvalue()
    frame += struct.pack(">H", _crc16(frame))
    si = _BitWriter()
    si.write(n, 16)
    si.write(n, 16)
    si.write(0, 48)
    si.write(16_000, 20)
    si.write(0, 3)
    si.write(15, 5)
    si.write(n, 36)
    si.align()
    import hashlib

    streaminfo = si.getvalue() + hashlib.md5(
        samples[:, None].astype("<i2").tobytes()
    ).digest()
    blob = (b"fLaC" + bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:]
            + streaminfo + frame)
    got, rate = flac_decode(blob)
    assert rate == 16_000
    assert np.array_equal(got[:, 0], samples)


def test_audio_stats_and_features_route_flac(spark):
    """A WAV and its FLAC transcode must produce IDENTICAL stats and
    feature vectors through the Spark plumbing (lossless decode), and
    sniff_format labels the container."""
    from etl_pipeline_last_fm_spark.operators.multimodal import (
        audio_stats,
        extract_features,
        sniff_format,
        wav_encode,
    )

    x = _tone(5000, ch=2)
    wav = wav_encode(x, 16_000)
    fl = flac_encode(x, 16_000)
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(fl))], "media_id long, content binary"
    )
    sniffed = {r["media_id"]: r["sniffed"] for r in sniff_format(df).collect()}
    assert sniffed == {1: "wav", 2: "flac"}
    stats = {r["media_id"]: r for r in audio_stats(df).collect()}
    for k in ("sample_rate", "n_channels", "n_samples", "duration_ms",
              "sum_abs", "max_abs", "zero_crossings"):
        assert stats[1][k] == stats[2][k], k
    feats = {r["media_id"]: r["feature"] for r in extract_features(df).collect()}
    assert feats[1] == feats[2]


def test_audio_stats_quarantines_bad_flac(spark):
    from etl_pipeline_last_fm_spark.operators.multimodal import audio_stats

    bad = b"fLaC" + b"\x00" * 10
    good = flac_encode(_tone(1000), 16_000)
    df = spark.createDataFrame(
        [(1, bytearray(bad)), (2, bytearray(good))],
        "media_id long, content binary",
    )
    rows = audio_stats(df, on_undecodable="skip").collect()
    assert [r["media_id"] for r in rows] == [2]
    with pytest.raises(Exception):
        audio_stats(df, on_undecodable="error").collect()
