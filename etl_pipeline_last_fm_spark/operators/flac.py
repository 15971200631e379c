"""FLAC codec: REAL, zero-dependency (stdlib + numpy).

The compressed member of the audio tier, next to WAV/PCM — the same role
baseline JPEG plays next to BMP in the image tier: a real entropy-coded
format implemented from the public spec (RFC 9639 / the original
xiph.org format document), so the Spark-side audio plumbing
(audio_stats / extract_features over mapInPandas) exercises genuine
decompression, not a stub.

Decoder surface (everything a 16-bit FLAC in the wild uses):
- STREAMINFO parsing + mandatory MD5 verification (FLAC carries a
  decoded-signal digest, so corruption is DETECTED, unlike JPEG);
- all four subframe types: CONSTANT, VERBATIM, FIXED (orders 0-4) and
  LPC (any order, any precision/shift);
- Rice residual coding, both methods (4- and 5-bit parameters), any
  partition order, including the raw-bits escape;
- all four channel assignments (independent, left/side, right/side,
  mid/side) and wasted-bits shifting;
- CRC-8 frame-header and CRC-16 frame checks (mismatch = ValueError).

Encoder surface (a real subset that produces spec-valid streams): fixed
blocking, per-subframe choice of CONSTANT / FIXED(0-4) / LPC
(Levinson–Durbin, quantized coefficients) / VERBATIM fallback by
estimated cost, per-partition Rice parameters at any partition order,
and the four stereo modes selectable (or 'auto' = cheapest per frame).
Only bits-per-sample 16 is encoded/decoded (the WAV tier's contract);
other depths raise NotImplementedError, malformed payloads ValueError.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        value &= (1 << nbits) - 1
        self._acc = (self._acc << nbits) | value
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self._out.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)

    def getvalue(self) -> bytes:
        assert self._nbits == 0
        return bytes(self._out)


class _BitReader:
    def __init__(self, data: bytes, pos_bytes: int = 0) -> None:
        self._d = data
        self._pos = pos_bytes * 8  # absolute bit position

    def read(self, nbits: int) -> int:
        end = self._pos + nbits
        if end > len(self._d) * 8:
            raise ValueError("truncated FLAC payload (bit read past EOF)")
        v = 0
        pos = self._pos
        while nbits:
            byte = self._d[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, nbits)
            shift = avail - take
            v = (v << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
            nbits -= take
        self._pos = pos
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        if v >= 1 << (nbits - 1):
            v -= 1 << nbits
        return v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self._pos >= len(self._d) * 8:
                raise ValueError("truncated FLAC payload (unary past EOF)")
            if self.read(1):
                return q
            q += 1

    def align(self) -> None:
        self._pos = (self._pos + 7) & ~7

    @property
    def byte_pos(self) -> int:
        assert self._pos % 8 == 0
        return self._pos // 8


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame index)."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (6 - nbytes) << (6 * (nbytes - 1))) and nbytes < 7:
        # max payload bits for nbytes leading bytes: (7-nbytes)+6*(nbytes-1)
        if n < 1 << ((7 - nbytes) + 6 * (nbytes - 1)):
            break
        nbytes += 1
    head_bits = 7 - nbytes
    out.append((0xFF << (head_bits + 1) & 0xFF) | (n >> (6 * (nbytes - 1))))
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n_follow = 0
    mask = 0x40
    while b0 & mask:
        n_follow += 1
        mask >>= 1
    if n_follow < 1 or n_follow > 6:
        raise ValueError("bad FLAC coded number")
    v = b0 & (mask - 1)
    for _ in range(n_follow):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("bad FLAC coded-number continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def _zigzag(res: np.ndarray) -> np.ndarray:
    return np.where(res >= 0, res << 1, ((-res) << 1) - 1).astype(np.int64)


def _rice_cost(u: np.ndarray, p: int) -> int:
    return int((u >> p).sum()) + u.size * (p + 1)


def _best_rice_param(u: np.ndarray) -> tuple[int, int]:
    """(param, cost) minimizing the exact Rice bit count."""
    best_p, best_c = 0, _rice_cost(u, 0)
    for p in range(1, 31):
        c = _rice_cost(u, p)
        if c < best_c:
            best_p, best_c = p, c
    return best_p, best_c


def _write_residual(bw: _BitWriter, res: np.ndarray, block_size: int,
                    order: int, partition_order: int) -> None:
    n_parts = 1 << partition_order
    if block_size % n_parts or (block_size >> partition_order) <= order:
        raise ValueError("invalid partition order for block")
    u = _zigzag(res)
    params = []
    bounds = []
    start = 0
    for i in range(n_parts):
        cnt = (block_size >> partition_order) - (order if i == 0 else 0)
        params.append(_best_rice_param(u[start:start + cnt])[0])
        bounds.append((start, start + cnt))
        start += cnt
    method = 0 if max(params) <= 14 else 1
    pbits = 4 if method == 0 else 5
    bw.write(method, 2)
    bw.write(partition_order, 4)
    for p, (lo, hi) in zip(params, bounds):
        bw.write(p, pbits)
        for x in u[lo:hi]:
            x = int(x)
            bw.write_unary(x >> p)
            bw.write(x & ((1 << p) - 1), p)


def _read_residual(br: _BitReader, block_size: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    partition_order = br.read(4)
    n_parts = 1 << partition_order
    if block_size % n_parts or (block_size >> partition_order) <= order:
        raise ValueError("invalid FLAC partition order")
    out = np.empty(block_size - order, dtype=np.int64)
    pos = 0
    for i in range(n_parts):
        cnt = (block_size >> partition_order) - (order if i == 0 else 0)
        p = br.read(pbits)
        if p == escape:
            nbits = br.read(5)
            for j in range(cnt):
                out[pos + j] = br.read_signed(nbits) if nbits else 0
        else:
            for j in range(cnt):
                q = br.read_unary()
                u = (q << p) | br.read(p)
                out[pos + j] = (u >> 1) ^ -(u & 1)
        pos += cnt
    return out


def _fixed_residual(s: np.ndarray, order: int) -> np.ndarray:
    r = s.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _lpc_coeffs(s: np.ndarray, order: int, precision: int = 15):
    """Quantized LPC coefficients via autocorrelation + Levinson–Durbin.
    Float math is ENCODER-ONLY: the residual is computed with the exact
    integer predictor the decoder will run, so the stream stays lossless
    regardless of coefficient quality."""
    x = s.astype(np.float64)
    n = x.size
    if n <= order:
        return None
    ac = [float(np.dot(x[: n - k], x[k:])) for k in range(order + 1)]
    if ac[0] == 0.0:
        return None
    err = ac[0]
    a = np.zeros(order)
    for i in range(order):
        k = ac[i + 1] - float(np.dot(a[:i], ac[i::-1][:i]))
        k /= err
        a[i] = k
        a[:i] = a[:i] - k * a[:i][::-1]
        err *= 1 - k * k
        if err <= 0:
            return None
    cmax = float(np.abs(a).max())
    if cmax == 0.0:
        return None
    shift = precision - 1
    while (cmax * (1 << shift)) >= (1 << (precision - 1)) and shift > 0:
        shift -= 1
    q = np.round(a * (1 << shift)).astype(np.int64)
    lim = 1 << (precision - 1)
    q = np.clip(q, -lim, lim - 1)
    if not q.any():
        return None
    return q, shift


def _lpc_residual(s: np.ndarray, coefs: np.ndarray, shift: int) -> np.ndarray:
    x = s.astype(np.int64)
    order = len(coefs)
    # prediction for i >= order: (sum_j coefs[j] * x[i-1-j]) >> shift
    pred = np.zeros(x.size - order, dtype=np.int64)
    for j, c in enumerate(coefs):
        pred += int(c) * x[order - 1 - j : x.size - 1 - j]
    return x[order:] - (pred >> shift)


def _encode_subframe(bw: _BitWriter, s: np.ndarray, bps: int,
                     partition_order: int, use_lpc: bool) -> None:
    n = s.size
    if n and np.all(s == s[0]):
        bw.write(0, 1)
        bw.write(0b000000, 6)
        bw.write(0, 1)
        bw.write_signed(int(s[0]), bps)
        return
    best = None  # (cost, kind, order, payload...)
    for order in range(min(5, n)):
        if (n >> partition_order) <= order or n % (1 << partition_order):
            continue
        res = _fixed_residual(s, order)
        u = _zigzag(res)
        cost = order * bps + _best_rice_param(u)[1] if u.size else order * bps
        if best is None or cost < best[0]:
            best = (cost, "fixed", order, res)
    if use_lpc and n > 16:
        for order in (8,):
            if (n >> partition_order) <= order or n % (1 << partition_order):
                continue
            qc = _lpc_coeffs(s, order)
            if qc is None:
                continue
            coefs, shift = qc
            res = _lpc_residual(s, coefs, shift)
            cost = (order * bps + 4 + 5 + order * 15
                    + _best_rice_param(_zigzag(res))[1])
            if best is None or cost < best[0]:
                best = (cost, "lpc", order, res, coefs, shift)
    verbatim_cost = n * bps
    if best is None or verbatim_cost < best[0]:
        bw.write(0, 1)
        bw.write(0b000001, 6)
        bw.write(0, 1)
        for x in s:
            bw.write_signed(int(x), bps)
        return
    if best[1] == "fixed":
        _, _, order, res = best
        bw.write(0, 1)
        bw.write(0b001000 | order, 6)
        bw.write(0, 1)
        for x in s[:order]:
            bw.write_signed(int(x), bps)
        _write_residual(bw, res, n, order, partition_order)
    else:
        _, _, order, res, coefs, shift = best
        bw.write(0, 1)
        bw.write(0b100000 | (order - 1), 6)
        bw.write(0, 1)
        for x in s[:order]:
            bw.write_signed(int(x), bps)
        bw.write(15 - 1, 4)  # precision 15
        bw.write(shift, 5)  # non-negative by construction
        for c in coefs:
            bw.write_signed(int(c), 15)
        _write_residual(bw, res, n, order, partition_order)


def _decode_subframe(br: _BitReader, n: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("bad FLAC subframe padding bit")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    bps -= wasted
    if t == 0b000000:
        out = np.full(n, br.read_signed(bps), dtype=np.int64)
    elif t == 0b000001:
        out = np.array([br.read_signed(bps) for _ in range(n)], dtype=np.int64)
    elif 0b001000 <= t <= 0b001100:
        order = t & 0x07
        warm = [br.read_signed(bps) for _ in range(order)]
        res = _read_residual(br, n, order)
        out = np.empty(n, dtype=np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, n):
            out[i] = res[i - order] + sum(
                c * out[i - 1 - j] for j, c in enumerate(coefs)
            )
    elif t >= 0b100000:
        order = (t & 0x1F) + 1
        warm = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC LPC precision escape")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, n, order)
        out = np.empty(n, dtype=np.int64)
        out[:order] = warm
        for i in range(order, n):
            pred = sum(c * out[i - 1 - j] for j, c in enumerate(coefs))
            out[i] = res[i - order] + (pred >> shift)
    else:
        raise ValueError(f"reserved FLAC subframe type {t:#08b}")
    return out << wasted


_BLOCK_SIZE_CODES = {192: 0b0001, 576: 0b0010, 1152: 0b0011, 2304: 0b0100,
                     4608: 0b0101, 256: 0b1000, 512: 0b1001, 1024: 0b1010,
                     2048: 0b1011, 4096: 0b1100, 8192: 0b1101,
                     16384: 0b1110, 32768: 0b1111}

_RATE_CODES = {88200: 0b0001, 176400: 0b0010, 192000: 0b0011, 8000: 0b0100,
               16000: 0b0101, 22050: 0b0110, 24000: 0b0111, 32000: 0b1000,
               44100: 0b1001, 48000: 0b1010, 96000: 0b1011}

_STEREO_CODES = {"left_side": 0b1000, "right_side": 0b1001, "mid_side": 0b1010}


def flac_encode(
    samples: np.ndarray,
    sample_rate: int = 16_000,
    block_size: int = 4096,
    stereo_mode: str = "auto",
    partition_order: int = 0,
    use_lpc: bool = True,
) -> bytes:
    """Encode an (n,) or (n, ch) int16 array as a spec-valid FLAC stream
    (fixed blocking). ``stereo_mode``: independent | left_side |
    right_side | mid_side | auto (cheapest per frame, 2-channel only)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2 or samples.dtype != np.int16:
        raise ValueError(
            f"expected int16 (n,) or (n, ch), got {samples.shape} {samples.dtype}"
        )
    n, ch = samples.shape
    if not 1 <= ch <= 8:
        raise ValueError(f"bad channel count {ch}")
    if n == 0:
        raise ValueError("empty signal")
    if stereo_mode != "independent" and ch != 2:
        if stereo_mode == "auto":
            stereo_mode = "independent"
        else:
            raise ValueError(f"{stereo_mode} needs 2 channels, got {ch}")
    md5 = hashlib.md5(samples.astype("<i2").tobytes()).digest()
    bw_frames = bytearray()
    frame_idx = 0
    for start in range(0, n, block_size):
        blk = samples[start:start + block_size].astype(np.int64)
        bs = blk.shape[0]
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocking
        bs_code = _BLOCK_SIZE_CODES.get(bs)
        bs_tail = b""
        if bs_code is None:
            if bs <= 256:
                bs_code, bs_tail = 0b0110, struct.pack("B", bs - 1)
            else:
                bs_code, bs_tail = 0b0111, struct.pack(">H", bs - 1)
        hdr.write(bs_code, 4)
        rate_code = _RATE_CODES.get(sample_rate)
        rate_tail = b""
        if rate_code is None:
            if sample_rate % 10 == 0 and sample_rate // 10 < 65536:
                rate_code = 0b1110
                rate_tail = struct.pack(">H", sample_rate // 10)
            elif sample_rate < 65536:
                rate_code = 0b1101
                rate_tail = struct.pack(">H", sample_rate)
            else:
                raise ValueError(f"unencodable sample rate {sample_rate}")
        hdr.write(rate_code, 4)
        mode = stereo_mode
        if mode == "auto":
            l, r = blk[:, 0], blk[:, 1]
            side = l - r
            costs = {
                "independent": int(np.abs(np.diff(l)).sum()
                                   + np.abs(np.diff(r)).sum()),
                "left_side": int(np.abs(np.diff(l)).sum()
                                 + np.abs(np.diff(side)).sum()),
                "right_side": int(np.abs(np.diff(r)).sum()
                                  + np.abs(np.diff(side)).sum()),
                "mid_side": int(np.abs(np.diff((l + r) >> 1)).sum()
                                + np.abs(np.diff(side)).sum()),
            }
            mode = min(costs, key=costs.get)
        if mode == "independent":
            hdr.write(ch - 1, 4)
            chans = [(blk[:, i], 16) for i in range(ch)]
        else:
            hdr.write(_STEREO_CODES[mode], 4)
            l, r = blk[:, 0], blk[:, 1]
            side = l - r
            if mode == "left_side":
                chans = [(l, 16), (side, 17)]
            elif mode == "right_side":
                chans = [(side, 17), (r, 16)]
            else:
                chans = [((l + r) >> 1, 16), (side, 17)]
        hdr.write(0b100, 3)  # 16 bits per sample
        hdr.write(0, 1)  # reserved
        hdr.align()
        head = hdr.getvalue() + _utf8_number(frame_idx) + bs_tail + rate_tail
        head += bytes([_crc8(head)])
        body = _BitWriter()
        for s, bps in chans:
            _encode_subframe(body, s, bps, partition_order, use_lpc)
        body.align()
        frame = head + body.getvalue()
        frame += struct.pack(">H", _crc16(frame))
        bw_frames += frame
        frame_idx += 1
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)  # max frame size unknown
    si.write(sample_rate, 20)
    si.write(ch - 1, 3)
    si.write(16 - 1, 5)
    si.write(n, 36)
    si.align()
    streaminfo = si.getvalue() + md5
    header = (b"fLaC"
              + bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:]
              + streaminfo)
    return header + bytes(bw_frames)


def flac_decode(content: bytes) -> tuple[np.ndarray, int]:
    """Decode a FLAC stream to ((n, ch) int16 array, sample_rate).
    Verifies frame CRCs and the STREAMINFO MD5 of the decoded signal
    (ValueError on any mismatch — FLAC corruption is detectable, unlike
    JPEG). RFC 9639 'unknown' markers are honored: total_samples == 0
    decodes frames to payload exhaustion, and an all-zero MD5 (unset)
    skips the digest check. Only 16-bit streams are supported
    (NotImplementedError otherwise — the WAV tier's depth contract)."""
    if content[:4] != b"fLaC":
        raise ValueError("not a FLAC payload (missing fLaC magic)")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(content):
            raise ValueError("truncated FLAC metadata")
        last = content[pos] & 0x80
        btype = content[pos] & 0x7F
        size = int.from_bytes(content[pos + 1 : pos + 4], "big")
        body = content[pos + 4 : pos + 4 + size]
        if len(body) < size:
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:
            streaminfo = body
        elif btype == 127:
            raise ValueError("invalid FLAC metadata block type 127")
        pos += 4 + size
        if last:
            break
    if streaminfo is None or len(streaminfo) != 34:
        raise ValueError("missing/odd-sized FLAC STREAMINFO")
    sb = _BitReader(streaminfo)
    sb.read(16)  # min block
    sb.read(16)  # max block
    sb.read(24)
    sb.read(24)
    rate = sb.read(20)
    ch = sb.read(3) + 1
    bps = sb.read(5) + 1
    total = sb.read(36)
    md5_want = streaminfo[18:34]
    if bps != 16:
        raise NotImplementedError(
            f"only 16-bit FLAC is decoded natively (got {bps})"
        )
    if rate < 1:
        raise ValueError("bad FLAC sample rate 0")
    # RFC 9639 §8.2: total_samples == 0 means UNKNOWN — decode frames
    # until the payload is exhausted instead of trusting the count.
    unknown_total = total == 0
    out = None if unknown_total else np.empty((total, ch), dtype=np.int16)
    blocks: list[np.ndarray] = []
    got = 0
    br = _BitReader(content, pos)
    while (br.byte_pos < len(content)) if unknown_total else (got < total):
        frame_start = br.byte_pos
        sync = br.read(14)
        if sync != 0b11111111111110:
            raise ValueError("lost FLAC frame sync")
        if br.read(1):
            raise ValueError("bad FLAC frame reserved bit")
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        rate_code = br.read(4)
        ch_code = br.read(4)
        size_code = br.read(3)
        if br.read(1):
            raise ValueError("bad FLAC frame reserved bit 2")
        _read_utf8_number(br)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code")
        elif bs_code == 1:
            bs = 192
        elif bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code == 6:
            bs = br.read(8) + 1
        elif bs_code == 7:
            bs = br.read(16) + 1
        else:
            bs = 256 << (bs_code - 8)
        if rate_code == 0b1100:
            br.read(8)
        elif rate_code in (0b1101, 0b1110):
            br.read(16)
        elif rate_code == 0b1111:
            raise ValueError("invalid FLAC frame rate code")
        # CRC-8 covers the header bytes up to (not incl.) the CRC byte;
        # the header IS byte-aligned here (32 fixed bits + whole bytes).
        br.align()
        crc_pos = br.byte_pos
        want8 = br.read(8)
        if _crc8(content[frame_start:crc_pos]) != want8:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        if size_code == 0b100:
            eff_bps = 16
        elif size_code == 0:
            eff_bps = bps
        else:
            raise NotImplementedError(
                f"only 16-bit FLAC frames are decoded (size code {size_code:#05b})"
            )
        if ch_code <= 7:
            n_ch = ch_code + 1
            if n_ch != ch:
                raise ValueError("FLAC frame channel count != STREAMINFO")
            chans = [
                _decode_subframe(br, bs, eff_bps) for _ in range(n_ch)
            ]
        elif ch_code in (8, 9, 10):
            if ch != 2:
                raise ValueError("stereo decorrelation in non-stereo stream")
            a = _decode_subframe(br, bs, eff_bps + (1 if ch_code == 9 else 0))
            b = _decode_subframe(br, bs, eff_bps + (0 if ch_code == 9 else 1))
            if ch_code == 8:  # left/side
                chans = [a, a - b]
            elif ch_code == 9:  # side/right
                chans = [a + b, b]
            else:  # mid/side
                side = b
                m2 = (a << 1) | (side & 1)
                chans = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError(f"reserved FLAC channel assignment {ch_code}")
        br.align()
        crc16_pos = br.byte_pos
        want16 = br.read(16)
        if _crc16(content[frame_start:crc16_pos]) != want16:
            raise ValueError("FLAC frame CRC-16 mismatch")
        take = bs if unknown_total else min(bs, total - got)
        blk = np.stack([c[:take] for c in chans], axis=1)
        if blk.max(initial=0) > 32767 or blk.min(initial=0) < -32768:
            raise ValueError("FLAC sample out of int16 range")
        if unknown_total:
            blocks.append(blk.astype(np.int16))
        else:
            out[got:got + take] = blk.astype(np.int16)
        got += take
    if unknown_total:
        out = (
            np.concatenate(blocks, axis=0)
            if blocks
            else np.empty((0, ch), dtype=np.int16)
        )
    # RFC 9639 §8.2: an all-zero stored digest means MD5 UNSET — nothing
    # to verify against (our encoder always sets it; wild files may not).
    if md5_want != b"\x00" * 16 and (
        hashlib.md5(out.astype("<i2").tobytes()).digest() != md5_want
    ):
        raise ValueError("FLAC MD5 signature mismatch (corrupt stream)")
    return out, rate
