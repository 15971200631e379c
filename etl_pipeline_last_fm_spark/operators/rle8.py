"""Microsoft RLE8 (BI_RLE8) video codec: REAL, zero-dependency — the
engine's first INTER-FRAME video path.

BI_RLE8 is the classic Windows run-length codec (biCompression = 1 in a
BITMAPINFOHEADER, fourcc 'MRLE'): 8-bit palette pixels, and — the part
that makes it a true inter-frame codec inside AVI — pixels the encoded
frame does NOT write PERSIST from the previous frame. The escape
vocabulary is cursor movement:

    nn pp   (nn >= 1)       encoded mode: nn repeats of palette index pp
    00 00                   end of line (cursor to x=0 of the next row up)
    00 01                   end of bitmap (remaining pixels all persist)
    00 02 dx dy             delta: cursor moves right dx, up dy rows —
                            the skipped pixels are the inter-frame hole
    00 nn p1..pnn [pad]     absolute mode (nn >= 3): nn literal indices,
                            padded to a 16-bit boundary

Rows run bottom-up (DIB order). A delta/EOL/EOB skip is exactly "copy
from the reference frame", so frame k decodes only against frame k−1 —
the same dependency structure as P-frames in modern codecs, minus the
motion compensation. That dependency is the honest cost: sampling frame
k requires decoding 0..k (frame_sample documents the exception), where
the intra-only formats (raw DIB / MJPG) decode any frame independently.

The modern DCT-based inter codecs (XVID / H.26x) remain
NotImplementedError — they genuinely need codec libraries; this module
is the spec-complete member of the family that doesn't.
"""

from __future__ import annotations

import numpy as np


def build_palette(frames: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(palette (k, 3) uint8 RGB sorted, per-frame index array (n, h, w)
    uint8) for an (n, h, w, 3) uint8 RGB cube with <= 256 distinct
    colors (ValueError above — RLE8 is a palette codec by definition)."""
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError(f"expected (n, h, w, 3) uint8, got {frames.shape}")
    flat = frames.reshape(-1, 3)
    packed = (
        flat[:, 0].astype(np.uint32) << 16
    ) | (flat[:, 1].astype(np.uint32) << 8) | flat[:, 2]
    uniq, inv = np.unique(packed, return_inverse=True)
    if uniq.size > 256:
        raise ValueError(
            f"RLE8 needs <= 256 distinct colors, got {uniq.size}"
        )
    palette = np.stack(
        [(uniq >> 16) & 0xFF, (uniq >> 8) & 0xFF, uniq & 0xFF], axis=1
    ).astype(np.uint8)
    idx = inv.astype(np.uint8).reshape(frames.shape[:3])
    return palette, idx


def rle8_encode_frame(
    cur: np.ndarray, prev: np.ndarray | None
) -> bytes:
    """Encode one (h, w) uint8 index frame against its reference (None
    for the first/key frame): unchanged spans become delta skips (the
    inter-frame hole), repeat runs ride encoded mode, non-repeating
    stretches of >= 3 ride absolute mode."""
    h, w = cur.shape
    out = bytearray()
    for row in range(h):  # DIB bottom-up: row 0 = image bottom
        y = h - 1 - row
        line = cur[y]
        ref = prev[y] if prev is not None else None
        x = 0
        while x < w:
            if ref is not None and line[x] == ref[x]:
                s = x
                while x < w and line[x] == ref[x]:
                    x += 1
                if x == w:
                    break  # EOL advances the cursor; pixels persist
                gap = x - s
                while gap > 0:
                    d = min(gap, 255)
                    out += bytes((0, 2, d, 0))
                    gap -= d
                continue
            # changed (or keyframe) segment starting at x
            run = 1
            while x + run < w and line[x + run] == line[x] and run < 255:
                run += 1
            if run >= 3:
                out += bytes((run, int(line[x])))
                x += run
                continue
            # short runs: collect a literal stretch until a long run
            # (>= 4) or an unchanged-vs-ref span (>= 4) starts
            s = x
            while x < w and (x - s) < 255:
                r = 1
                while x + r < w and line[x + r] == line[x] and r < 4:
                    r += 1
                if r >= 4:
                    break
                if ref is not None:
                    u = 0
                    while x + u < w and u < 4 and line[x + u] == ref[x + u]:
                        u += 1
                    if u >= 4:
                        break
                x += 1
            lit = x - s
            if lit >= 3:
                out += bytes((0, lit)) + line[s:x].tobytes()
                if lit & 1:
                    out += b"\x00"  # absolute runs pad to 16-bit
            else:
                for i in range(lit):
                    out += bytes((1, int(line[s + i])))
        out += b"\x00\x00"  # EOL
    out += b"\x00\x01"  # EOB
    return bytes(out)


def rle8_decode_frame(
    data: bytes, w: int, h: int, prev: np.ndarray | None
) -> np.ndarray:
    """Decode one RLE8 frame to an (h, w) uint8 index array. Pixels the
    stream does not write persist from ``prev`` (zero for a keyframe).
    Malformed streams (cursor out of bounds, truncation, bad escapes)
    raise ValueError — the quarantine contract."""
    img = (
        prev.copy() if prev is not None else np.zeros((h, w), dtype=np.uint8)
    )
    x = 0
    row = 0  # bottom-up DIB row
    pos = 0
    n = len(data)
    while True:
        if pos + 2 > n:
            raise ValueError("truncated RLE8 stream (no EOB)")
        b0, b1 = data[pos], data[pos + 1]
        pos += 2
        if b0 == 0:
            if b1 == 0:  # EOL
                row += 1
                x = 0
                if row > h:
                    raise ValueError("RLE8 EOL past image top")
                continue
            if b1 == 1:  # EOB
                return img
            if b1 == 2:  # delta
                if pos + 2 > n:
                    raise ValueError("truncated RLE8 delta")
                dx, dy = data[pos], data[pos + 1]
                pos += 2
                x += dx
                row += dy
                if x > w or row >= h:
                    raise ValueError("RLE8 delta past image bounds")
                continue
            # absolute mode: b1 literals
            cnt = b1
            end = pos + cnt
            if end > n:
                raise ValueError("truncated RLE8 absolute run")
            if row >= h or x + cnt > w:
                raise ValueError("RLE8 absolute run past image bounds")
            img[h - 1 - row, x : x + cnt] = np.frombuffer(
                data, dtype=np.uint8, count=cnt, offset=pos
            )
            x += cnt
            pos = end + (cnt & 1)  # word alignment
            continue
        # encoded mode: b0 repeats of b1
        if row >= h or x + b0 > w:
            raise ValueError("RLE8 encoded run past image bounds")
        img[h - 1 - row, x : x + b0] = b1
        x += b0
