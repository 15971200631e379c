"""Baseline JPEG (JFIF) codec — REAL, zero-dependency (stdlib + numpy).

Baseline sequential DCT JPEG (ITU-T.81 SOF0) is implementable with numpy
matrix arithmetic plus a pure-Python entropy coder: 8x8 forward/inverse
DCT as an orthonormal matrix sandwich, the Annex-K quantization and
Huffman tables, canonical-code Huffman encode/decode with byte stuffing,
and the JFIF marker walk. No codec library involved — this module closes
the JPEG branch of the multimodal decode surface the same way the
BMP/PNG/WAV/AVI codecs closed theirs (operators/multimodal.py).

Scope (and the quarantine contract, matching the sibling codecs):

- ``jpeg_encode``: 8-bit grayscale or RGB, 4:4:4 or 4:2:0 chroma
  subsampling, libjpeg-style quality scaling of the Annex-K tables,
  optional restart intervals — enough to generate spec-shaped fixtures
  that exercise every decoder path this module owns.
- ``jpeg_decode``: baseline sequential (SOF0/SOF1), 8-bit precision,
  1 or 3 components, sampling factors up to 2x2, restart markers,
  multi-table DQT/DHT segments. Returns (h, w, 3) uint8 RGB (grayscale
  replicated so the downstream image tier — stats/features/resize —
  composes unchanged).
- Malformed payloads raise ValueError (truncation, bad markers, invalid
  Huffman codes, runs past block end); format variants that genuinely
  need more machinery raise NotImplementedError (progressive SOF2,
  hierarchical/lossless SOFs, arithmetic coding, 16-bit quant tables,
  12-bit precision) — both quarantine-catchable.

At 100 TB the per-row Python cost rides the one sanctioned hop
(mapInPandas over Arrow batches, see operators/multimodal.py) exactly
like the other codecs; entropy decode is inherently sequential per
payload, and payload-level parallelism is the partition axis.
"""

from __future__ import annotations

import struct

import numpy as np

# --- Tables -------------------------------------------------------------

# Zigzag scan: flat natural-order indices in zigzag sequence. Generated,
# not transcribed (diagonal s = i+j; odd diagonals walk i ascending, even
# ones descending — the T.81 figure A.6 order).
_ZZ = np.array(
    [
        i * 8 + j
        for i, j in sorted(
            ((i, j) for i in range(8) for j in range(8)),
            key=lambda ij: (
                ij[0] + ij[1],
                ij[0] if (ij[0] + ij[1]) % 2 else -ij[0],
            ),
        )
    ],
    dtype=np.int64,
)

# Orthonormal 8-point DCT-II matrix: forward F = D @ B @ D.T, inverse
# B = D.T @ F @ D (D is orthogonal).
_D = np.cos((2 * np.arange(8)[None, :] + 1) * np.arange(8)[:, None] * np.pi / 16) * 0.5
_D[0, :] /= np.sqrt(2.0)

# Annex-K quantization tables (natural order).
_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)
_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Annex-K typical Huffman tables: (BITS[1..16] code-length counts,
# HUFFVAL). The encoder writes them into DHT and the decoder reads DHT,
# so a decode never depends on these constants matching the spec — but
# they are the spec's tables, and the import-time asserts below pin the
# structural invariants (count sum == value count, <= 16 lengths).
_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
for _bits, _vals in (_HUFF_DC_LUMA, _HUFF_DC_CHROMA, _HUFF_AC_LUMA, _HUFF_AC_CHROMA):
    assert len(_bits) == 16 and sum(_bits) == len(_vals), (sum(_bits), len(_vals))
del _bits, _vals


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 1..100 -> scaled Annex-K table, clipped
    to [1, 255] (quality 100 => all-ones table, i.e. DCT-rounding-only
    loss)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) for the encoder (T.81 C.2 canonical
    assignment)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value for the decoder (same canonical walk)."""
    out: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


# --- Entropy-coded segment I/O ------------------------------------------


class _BitWriter:
    """MSB-first bit accumulator with JPEG byte stuffing (0xFF -> 0xFF
    0x00) and 1-padding to the byte boundary (T.81 F.1.2.3)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, val: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (val & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            n = 8 - self.nbits
            self.write((1 << n) - 1, n)


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment: un-stuffs
    0xFF 0x00, refuses to read through a real marker (the caller handles
    restart markers explicitly via ``expect_restart``)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if not self.nbits:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated")
            b = self.data[self.pos]
            if b == 0xFF:
                if self.pos + 1 >= len(self.data):
                    raise ValueError("JPEG entropy stream truncated at 0xFF")
                nxt = self.data[self.pos + 1]
                if nxt != 0x00:
                    raise ValueError(
                        f"unexpected marker 0xFF{nxt:02X} inside JPEG entropy data"
                    )
                self.pos += 2
            else:
                self.pos += 1
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def expect_restart(self, idx: int) -> None:
        """Byte-align and consume RST(idx mod 8) (T.81 E.1.4)."""
        self.nbits = 0
        if (
            self.pos + 2 > len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + (idx % 8)
        ):
            raise ValueError(f"missing JPEG restart marker RST{idx % 8}")
        self.pos += 2


def _read_huff(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map an s-bit magnitude to its signed value."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


# --- Block codec ---------------------------------------------------------


def _encode_block(
    w: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc: dict[int, tuple[int, int]],
    ac: dict[int, tuple[int, int]],
) -> int:
    diff = int(zz[0]) - pred
    s = _category(diff)
    code, length = dc[s]
    w.write(code, length)
    if s:
        w.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac[0xF0]  # ZRL: 16 zeros
            w.write(zc, zl)
            run -= 16
        s = _category(v)
        code, length = ac[(run << 4) | s]
        w.write(code, length)
        w.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, length = ac[0x00]  # EOB
        w.write(code, length)
    return int(zz[0])


def _decode_block(
    reader: _BitReader,
    dc: dict[tuple[int, int], int],
    ac: dict[tuple[int, int], int],
    pred: int,
) -> tuple[np.ndarray, int]:
    s = _read_huff(reader, dc)
    if s > 15:
        raise ValueError(f"bad JPEG DC category {s}")
    dc_val = pred + _extend(reader.read_bits(s), s)
    zz = np.zeros(64, dtype=np.int64)
    zz[0] = dc_val
    k = 1
    while k < 64:
        rs = _read_huff(reader, ac)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC run past block end")
        zz[k] = _extend(reader.read_bits(s), s)
        k += 1
    return zz, dc_val


# --- Color transforms -----------------------------------------------------

_RGB2YCC = np.array(
    [
        [0.299, 0.587, 0.114],
        [-0.168736, -0.331264, 0.5],
        [0.5, -0.418688, -0.081312],
    ]
)


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    out = px.astype(np.float64) @ _RGB2YCC.T
    out[:, :, 1:] += 128.0
    return out


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# --- Encoder ---------------------------------------------------------------


def _pad_to_blocks(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Edge-replicate pad to multiples of (bh, bw) — the standard MCU
    padding that keeps the DC of edge blocks unbiased."""
    h, w = plane.shape
    return np.pad(
        plane,
        ((0, (-h) % bh), (0, (-w) % bw)),
        mode="edge",
    )


def jpeg_encode(
    pixels: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB or (h, w) grayscale array as a
    baseline sequential JFIF JPEG. ``subsampling`` is '444' or '420'
    (color only); ``restart_interval`` > 0 emits DRI + RSTn markers
    every that many MCUs — the fixture knob for the decoder's restart
    path."""
    if pixels.ndim == 2:
        gray = True
    elif pixels.ndim == 3 and pixels.shape[2] == 3:
        gray = False
    else:
        raise ValueError(f"expected (h, w, 3) RGB or (h, w) gray array, got {pixels.shape}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be 444|420, got {subsampling!r}")
    if restart_interval < 0 or restart_interval > 0xFFFF:
        raise ValueError(f"bad restart interval {restart_interval}")
    h_img, w_img = pixels.shape[:2]
    if h_img < 1 or w_img < 1 or h_img > 0xFFFF or w_img > 0xFFFF:
        raise ValueError(f"bad image dimensions {w_img}x{h_img}")

    ql = _scaled_quant(_QUANT_LUMA, quality)
    qc = _scaled_quant(_QUANT_CHROMA, quality)

    # comp: (id, h_factor, v_factor, quant_table_idx, plane)
    if gray:
        comps = [(1, 1, 1, 0, pixels.astype(np.float64))]
    else:
        ycc = _rgb_to_ycbcr(pixels)
        if subsampling == "444":
            comps = [
                (1, 1, 1, 0, ycc[:, :, 0]),
                (2, 1, 1, 1, ycc[:, :, 1]),
                (3, 1, 1, 1, ycc[:, :, 2]),
            ]
        else:  # 420: chroma planes box-averaged 2x2
            even_h, even_w = h_img + (h_img & 1), w_img + (w_img & 1)
            cc = []
            for c in (1, 2):
                p = np.pad(
                    ycc[:, :, c],
                    ((0, even_h - h_img), (0, even_w - w_img)),
                    mode="edge",
                )
                cc.append(p.reshape(even_h // 2, 2, even_w // 2, 2).mean(axis=(1, 3)))
            comps = [
                (1, 2, 2, 0, ycc[:, :, 0]),
                (2, 1, 1, 1, cc[0]),
                (3, 1, 1, 1, cc[1]),
            ]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w_img // (8 * hmax))
    mcuy = -(-h_img // (8 * vmax))

    # Pad every component plane to its full MCU-grid extent.
    planes = []
    for cid, hf, vf, tq, plane in comps:
        planes.append((cid, hf, vf, tq, _pad_to_blocks(plane, mcuy * 8 * vf, mcux * 8 * hf)))

    dc_enc = [_canonical_codes(*_HUFF_DC_LUMA), _canonical_codes(*_HUFF_DC_CHROMA)]
    ac_enc = [_canonical_codes(*_HUFF_AC_LUMA), _canonical_codes(*_HUFF_AC_CHROMA)]
    quants = [ql, qc]

    out = bytearray(b"\xff\xd8")  # SOI
    # APP0 JFIF v1.01, no thumbnail.
    app0 = b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 1, 0, 1, 1, 0, 0)
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    # DQT (zigzag order on the wire).
    for tq, tab in enumerate(quants if not gray else quants[:1]):
        body = bytes([tq]) + bytes(int(x) for x in tab.reshape(64)[_ZZ])
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body
    # SOF0.
    sof = struct.pack(">BHHB", 8, h_img, w_img, len(planes))
    for cid, hf, vf, tq, _ in planes:
        sof += struct.pack(">BBB", cid, (hf << 4) | vf, tq)
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT.
    huffs = [(0x00, _HUFF_DC_LUMA), (0x10, _HUFF_AC_LUMA)]
    if not gray:
        huffs += [(0x01, _HUFF_DC_CHROMA), (0x11, _HUFF_AC_CHROMA)]
    for tc_th, (bits, vals) in huffs:
        body = bytes([tc_th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS.
    sos = bytes([len(planes)])
    for cid, _, _, tq, _ in planes:
        # luma -> table set 0, chroma -> set 1 (mirrors tq here).
        sos += bytes([cid, (tq << 4) | tq])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    writer = _BitWriter()
    preds = {cid: 0 for cid, *_ in planes}
    rst_idx = 0
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            writer.pad_to_byte()
            writer.out += bytes([0xFF, 0xD0 + (rst_idx % 8)])
            rst_idx += 1
            preds = {cid: 0 for cid, *_ in planes}
        my, mx = divmod(m, mcux)
        for cid, hf, vf, tq, plane in planes:
            for by in range(vf):
                for bx in range(hf):
                    r0 = (my * vf + by) * 8
                    c0 = (mx * hf + bx) * 8
                    block = plane[r0 : r0 + 8, c0 : c0 + 8] - 128.0
                    coef = _D @ block @ _D.T
                    q = np.round(coef / quants[tq]).astype(np.int64)
                    zz = q.reshape(64)[_ZZ]
                    preds[cid] = _encode_block(
                        writer, zz, preds[cid], dc_enc[tq], ac_enc[tq]
                    )
    writer.pad_to_byte()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- Decoder ---------------------------------------------------------------

_SOF_UNSUPPORTED = {
    0xC2: "progressive JPEG (SOF2)",
    0xC3: "lossless JPEG (SOF3)",
    0xC5: "differential sequential JPEG (SOF5)",
    0xC6: "differential progressive JPEG (SOF6)",
    0xC7: "differential lossless JPEG (SOF7)",
    0xC9: "arithmetic-coded JPEG (SOF9)",
    0xCA: "arithmetic-coded progressive JPEG (SOF10)",
    0xCB: "arithmetic-coded lossless JPEG (SOF11)",
    0xCD: "differential arithmetic JPEG (SOF13)",
    0xCE: "differential arithmetic progressive JPEG (SOF14)",
    0xCF: "differential arithmetic lossless JPEG (SOF15)",
}


def jpeg_decode(content: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG to (h, w, 3) uint8 RGB
    (grayscale replicated across channels). See the module docstring for
    the supported surface and the ValueError/NotImplementedError
    quarantine contract."""
    if len(content) < 4 or content[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG payload (missing SOI magic)")
    pos = 2
    quants: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict[tuple[int, int], int]] = {}
    ac_tabs: dict[int, dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, [(cid, hf, vf, tq), ...])
    restart_interval = 0
    scan = None

    while pos + 2 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker byte at {pos}")
        m = content[pos + 1]
        if m == 0xD8 or (0xD0 <= m <= 0xD7):  # SOI / stray RST: no segment
            pos += 2
            continue
        if m == 0xD9:  # EOI
            break
        if pos + 4 > len(content):
            raise ValueError("truncated JPEG segment header")
        seg_len = struct.unpack_from(">H", content, pos + 2)[0]
        if seg_len < 2 or pos + 2 + seg_len > len(content):
            raise ValueError(f"truncated JPEG segment 0xFF{m:02X}")
        body = content[pos + 4 : pos + 2 + seg_len]
        if m == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq == 1:
                    raise NotImplementedError("16-bit JPEG quantization tables")
                if pq != 0 or tq > 3 or i + 65 > len(body):
                    raise ValueError("bad JPEG DQT segment")
                tab = np.zeros(64, dtype=np.int64)
                tab[_ZZ] = np.frombuffer(body, np.uint8, 64, i + 1)
                quants[tq] = tab.reshape(8, 8)
                i += 65
        elif m == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                if i + 17 > len(body):
                    raise ValueError("bad JPEG DHT segment")
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                if tc > 1 or th > 3 or i + 17 + n > len(body):
                    raise ValueError("bad JPEG DHT segment")
                vals = list(body[i + 17 : i + 17 + n])
                (ac_tabs if tc else dc_tabs)[th] = _decode_table(bits, vals)
                i += 17 + n
        elif m in (0xC0, 0xC1):  # baseline / extended sequential
            if len(body) < 6:
                raise ValueError("bad JPEG SOF segment")
            prec, h_img, w_img, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG precision")
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG")
            if len(body) != 6 + 3 * nc or h_img < 1 or w_img < 1:
                raise ValueError("bad JPEG SOF segment")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * c)
                hf, vf = hv >> 4, hv & 0x0F
                if hf not in (1, 2) or vf not in (1, 2):
                    raise NotImplementedError(
                        f"JPEG sampling factors {hf}x{vf} (only 1..2 supported)"
                    )
                comps.append((cid, hf, vf, tq))
            frame = (h_img, w_img, comps)
        elif m in _SOF_UNSUPPORTED:
            raise NotImplementedError(f"{_SOF_UNSUPPORTED[m]} is not decoded natively")
        elif m == 0xDD:  # DRI
            if len(body) != 2:
                raise ValueError("bad JPEG DRI segment")
            restart_interval = struct.unpack(">H", body)[0]
        elif m == 0xDA:  # SOS: header, then the entropy-coded segment
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0] if body else -1
            if ns != len(frame[2]) or len(body) != 1 + 2 * ns + 3:
                raise NotImplementedError(
                    "non-interleaved / multi-scan JPEG is not decoded natively"
                )
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            if (ss, se, ahal) != (0, 63, 0):
                raise NotImplementedError("progressive-scan JPEG parameters")
            tabs = {}
            for c in range(ns):
                cid, tdta = body[1 + 2 * c], body[2 + 2 * c]
                tabs[cid] = (tdta >> 4, tdta & 0x0F)
            scan = (tabs, pos + 2 + seg_len)
            break
        # APPn / COM / anything else with a length: skip.
        pos += 2 + seg_len

    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    h_img, w_img, comps = frame
    tabs, spos = scan

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w_img // (8 * hmax))
    mcuy = -(-h_img // (8 * vmax))
    planes = {
        cid: np.zeros((mcuy * 8 * vf, mcux * 8 * hf), dtype=np.float64)
        for cid, hf, vf, _ in comps
    }
    for cid, hf, vf, tq in comps:
        if tq not in quants:
            raise ValueError(f"JPEG component {cid} references missing DQT {tq}")
        td, ta = tabs[cid]
        if td not in dc_tabs or ta not in ac_tabs:
            raise ValueError(f"JPEG component {cid} references missing DHT {td}/{ta}")

    reader = _BitReader(content, spos)
    preds = {cid: 0 for cid, *_ in comps}
    rst_idx = 0
    for m_i in range(mcux * mcuy):
        if restart_interval and m_i and m_i % restart_interval == 0:
            reader.expect_restart(rst_idx)
            rst_idx += 1
            preds = {cid: 0 for cid, *_ in comps}
        my, mx = divmod(m_i, mcux)
        for cid, hf, vf, tq in comps:
            td, ta = tabs[cid]
            for by in range(vf):
                for bx in range(hf):
                    zz, preds[cid] = _decode_block(
                        reader, dc_tabs[td], ac_tabs[ta], preds[cid]
                    )
                    nat = np.zeros(64, dtype=np.int64)
                    nat[_ZZ] = zz
                    coef = nat.reshape(8, 8) * quants[tq]
                    block = _D.T @ coef @ _D + 128.0
                    r0 = (my * vf + by) * 8
                    c0 = (mx * hf + bx) * 8
                    planes[cid][r0 : r0 + 8, c0 : c0 + 8] = block

    # Upsample subsampled components to the full grid, crop, compose.
    full = {}
    for cid, hf, vf, _ in comps:
        p = planes[cid]
        if hf < hmax or vf < vmax:
            p = np.repeat(np.repeat(p, vmax // vf, axis=0), hmax // hf, axis=1)
        full[cid] = p[:h_img, :w_img]
    if len(comps) == 1:
        g = np.clip(np.round(full[comps[0][0]]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    c1, c2, c3 = (full[c[0]] for c in comps)
    return _ycbcr_to_rgb(c1, c2, c3)
