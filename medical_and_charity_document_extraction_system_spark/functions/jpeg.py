"""Pure-Python baseline JPEG codec — stdlib + numpy, no PIL/cv2.

Together with functions/png.py this covers the two dominant web image
containers natively; reference analog loads them via cv2
(/root/reference/backend/app/utils/file_utils.py:129-173). Public-spec
code only (ITU-T T.81 / ISO 10918-1, JFIF).

Decoder: baseline sequential DCT (SOF0), 8-bit, gray or YCbCr with
arbitrary sampling factors (4:4:4 / 4:2:2 / 4:2:0 ...), multiple
DQT/DHT segments, restart markers (DRI/RSTn), byte stuffing. Huffman
decoding uses a flat 16-bit peek table per Huffman table (one dict
lookup per symbol would be ~5x slower); the IDCT runs as ONE einsum
over all blocks of a component — the per-block work is numpy, only
the entropy decode is a Python loop (inherent: a Huffman stream is
sequential). Progressive (SOF2) and arithmetic coding raise, so
callers degrade to the error row.

Encoder: baseline, quality-scaled Annex K quantization tables,
standard Annex K Huffman tables, 4:4:4 or 4:2:0, optional restart
interval; deterministic (no timestamps, fixed table order) — same
pixels, same bytes. Lossy by nature: tests assert near-identity, plus
bit-identical decoder determinism.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegError(ValueError):
    pass


# zigzag: index i of the zigzag sequence -> position in the 8x8 block
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# ITU T.81 Annex K.1 — luminance / chrominance quantization tables
_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 — standard Huffman tables: (bit-length counts[1..16], symbols)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal DCT-II basis: A[k, n] = c(k) cos((2n+1)k pi / 16)
_A = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
            * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def _canonical_codes(counts: list[int], symbols: list[int]):
    """(counts per bit length 1..16, symbols) -> list of
    (code, length, symbol) in canonical order."""
    out = []
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out.append((code, length, symbols[k]))
            code += 1
            k += 1
        code <<= 1
    return out


def _peek_table(counts: list[int], symbols: list[int]) -> np.ndarray:
    """Flat 2^16 lookup: 16-bit window -> (symbol << 8) | code length.
    0 marks an invalid prefix."""
    tbl = np.zeros(1 << 16, dtype=np.uint32)
    for code, length, sym in _canonical_codes(counts, symbols):
        lo = code << (16 - length)
        hi = lo + (1 << (16 - length))
        tbl[lo:hi] = (sym << 8) | length
    return tbl


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 stuffing
    removed on the fly; stops (pads with 1s) at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0
        self.marker = None  # set when an RST/EOI-class marker is hit

    def _fill(self) -> None:
        while self.nbits <= 48:
            if self.marker is not None or self.pos >= len(self.data):
                self.buf = (self.buf << 8) | 0xFF  # pad
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:  # stuffed 0xFF data byte
                    self.pos += 2
                else:  # a real marker terminates the segment
                    self.marker = nxt
                    self.buf = (self.buf << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.buf = (self.buf << 8) | b
            self.nbits += 8

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill()
        return (self.buf >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.nbits -= n
        self.buf &= (1 << self.nbits) - 1

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        v = (self.buf >> (self.nbits - n)) & ((1 << n) - 1)
        self.skip(n)
        return v

    def sync_to_marker(self) -> int | None:
        """Drop buffered bits, consume the pending marker (RSTn).
        ``pos`` always sits ON the 0xFF when ``marker`` is set (or is
        scanned forward to it here)."""
        self.buf = 0
        self.nbits = 0
        if self.marker is None:
            while self.pos + 1 < len(self.data):
                if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                    self.marker = self.data[self.pos + 1]
                    break
                self.pos += 1
        m = self.marker
        if m is not None:
            self.pos += 2
            self.marker = None
        return m


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_jpeg_impl(data: bytes) -> np.ndarray:
    """JPEG bytes -> uint8 ndarray: (H,W) for 1 component, (H,W,3) RGB
    for 3 (YCbCr converted)."""
    data = bytes(data)
    if data[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG payload (no SOI)")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], np.ndarray] = {}
    comps = None  # list of dicts: id, h, v, tq
    h = w = 0
    restart_interval = 0
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise JpegError("marker expected")
        marker = data[pos + 1]
        if marker == 0xD8:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                if pq == 0:
                    vals = np.frombuffer(body[i : i + 64], np.uint8).astype(np.int64)
                    i += 64
                else:
                    vals = np.frombuffer(body[i : i + 128], ">u2").astype(np.int64)
                    i += 128
                qtables[tq] = vals
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                counts = list(body[i + 1 : i + 17])
                nsym = sum(counts)
                symbols = list(body[i + 17 : i + 17 + nsym])
                htables[(tc, th)] = _peek_table(counts, symbols)
                i += 17 + nsym
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision = body[0]
            if precision != 8:
                raise JpegError(f"unsupported precision {precision}")
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JpegError("only baseline sequential JPEG is supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if comps is None:
                raise JpegError("SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cid, tt = body[1 + 2 * c : 3 + 2 * c]
                comp = next((x for x in comps if x["id"] == cid), None)
                if comp is None:
                    raise JpegError(f"SOS references unknown component {cid}")
                scan.append((comp, tt >> 4, tt & 0xF))
            return _decode_scan(
                data, pos + 2 + seglen, scan, qtables, htables, h, w,
                restart_interval,
            )
        # APPn / COM / others: skip
        pos += 2 + seglen
    raise JpegError("no SOS segment")


def _decode_scan(data, pos, scan, qtables, htables, h, w, restart_interval):
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # coefficient store per component: (blocks_y, blocks_x, 64) zigzag
    store = []
    for comp, _, _ in scan:
        store.append(
            np.zeros((mcus_y * comp["v"], mcus_x * comp["h"], 64), dtype=np.int32)
        )
    br = _BitReader(data, pos)
    preds = [0] * len(scan)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                m = br.sync_to_marker()
                if m is not None and 0xD0 <= m <= 0xD7:
                    preds = [0] * len(scan)
                elif m is not None and m != 0xD9:
                    raise JpegError(f"expected RST marker, got {m:#x}")
            for ci, (comp, td, ta) in enumerate(scan):
                dct = htables.get((0, td))
                act = htables.get((1, ta))
                if dct is None or act is None:
                    raise JpegError("scan references undefined Huffman table")
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        blk = store[ci][
                            my * comp["v"] + by, mx * comp["h"] + bx
                        ]
                        _decode_block(br, dct, act, blk, preds, ci)
            mcu_count += 1
    # dequantize + IDCT + assemble planes
    planes = []
    for ci, (comp, _, _) in enumerate(scan):
        q = qtables.get(comp["tq"])
        if q is None:
            raise JpegError("component references undefined quant table")
        coefs = store[ci].astype(np.float64) * q[None, None, :]
        blocks = np.zeros(coefs.shape[:2] + (8, 8))
        blocks.reshape(coefs.shape[:2] + (64,))[:, :, _ZIGZAG] = coefs
        # IDCT: X = A.T @ C @ A for every block, one einsum
        pix = np.einsum("ij,yxjk,kl->yxil", _A.T, blocks, _A) + 128.0
        by, bx = pix.shape[:2]
        plane = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        # upsample to full resolution then crop
        plane = np.repeat(
            np.repeat(plane, vmax // comp["v"], axis=0), hmax // comp["h"], axis=1
        )[:h, :w]
        planes.append(plane)
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if len(planes) != 3:
        raise JpegError(f"unsupported component count {len(planes)}")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


def _decode_block(br, dct, act, blk, preds, ci):
    # DC
    sym_len = int(dct[br.peek16()])
    if sym_len == 0:
        raise JpegError("invalid DC Huffman code")
    t = sym_len >> 8
    br.skip(sym_len & 0xFF)
    diff = _extend(br.read(t), t)
    preds[ci] += diff
    blk[0] = preds[ci]
    # AC
    k = 1
    while k < 64:
        sym_len = int(act[br.peek16()])
        if sym_len == 0:
            raise JpegError("invalid AC Huffman code")
        rs = sym_len >> 8
        br.skip(sym_len & 0xFF)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL: skip 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise JpegError("AC run past end of block")
        blk[k] = _extend(br.read(s), s)
        k += 1


# ----------------------------------------------------------------- write
def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling of an Annex K table."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q * s + 50) // 100, 1, 255)


def _encode_table_codes(counts, symbols):
    codes = {}
    for code, length, sym in _canonical_codes(counts, symbols):
        codes[sym] = (code, length)
    return codes


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.buf >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
            self.buf &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _fdct_quant(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(blocks_y*8, blocks_x*8) centered plane -> (by, bx, 64) zigzag
    quantized int coefficients, all blocks in one einsum."""
    by, bx = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
    coefs = np.einsum("ij,yxjk,kl->yxil", _A, blocks, _A.T)
    zz = coefs.reshape(by, bx, 64)[:, :, _ZIGZAG]  # zz[i] = block[ZZ[i]]
    return np.round(zz / qtab[None, None, :]).astype(np.int32)


def _encode_block(bw, blk, pred, dc_codes, ac_codes):
    diff = int(blk[0]) - pred
    mag = abs(diff)
    t = mag.bit_length()
    code, length = dc_codes[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    nz = np.nonzero(blk[1:])[0]
    last_nz = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]
            bw.write(code, length)
            run -= 16
        mag = abs(v)
        s = mag.bit_length()
        code, length = ac_codes[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]
        bw.write(code, length)
    return int(blk[0])


def _dht_segment(tc, th, table):
    counts, symbols = table
    body = bytes([(tc << 4) | th]) + bytes(counts) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    image: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 gray (H,W) or RGB (H,W,3) -> baseline JPEG bytes.
    Deterministic; ``subsampling`` is '444' or '420' (chroma
    decimated 2x2 by box mean); ``restart_interval`` > 0 emits DRI +
    RSTn markers every N MCUs (exercises the decoder's restart
    path)."""
    img = np.asarray(image, dtype=np.uint8)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise JpegError(f"unsupported image shape {image.shape}")
    if subsampling not in ("444", "422", "420"):
        raise JpegError(f"unsupported subsampling {subsampling!r}")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise JpegError("zero-dimension image")
    qy = _quality_scale(_Q_LUMA, quality)
    qc = _quality_scale(_Q_CHROMA, quality)

    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
        cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]
        planes = [y, cb, cr]
        samp = {
            "444": [(1, 1)] * 3,
            "422": [(2, 1), (1, 1), (1, 1)],  # chroma halved horizontally
            "420": [(2, 2), (1, 1), (1, 1)],
        }[subsampling]
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # per-component sampled planes padded to whole MCUs
    comp_blocks = []
    for (sh, sv), plane, qs in zip(samp, planes, qsel):
        if (sh, sv) != (hmax, vmax):  # decimate by box mean
            fy, fx = vmax // sv, hmax // sh
            ph = -(-plane.shape[0] // fy) * fy
            pw = -(-plane.shape[1] // fx) * fx
            pp = np.pad(
                plane,
                ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                mode="edge",
            )
            plane = pp.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        th_ = mcus_y * sv * 8
        tw_ = mcus_x * sh * 8
        pp = np.pad(
            plane,
            ((0, th_ - plane.shape[0]), (0, tw_ - plane.shape[1])),
            mode="edge",
        )
        comp_blocks.append(_fdct_quant(pp - 128.0, qy if qs == 0 else qc))

    dc_codes = [_encode_table_codes(*_DC_LUMA), _encode_table_codes(*_DC_CHROMA)]
    ac_codes = [_encode_table_codes(*_AC_LUMA), _encode_table_codes(*_AC_CHROMA)]

    out = bytearray(b"\xff\xd8")
    # JFIF APP0
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    for tq, tab in ((0, qy), (1, qc)) if not gray else ((0, qy),):
        body = bytes([tq]) + bytes(int(x) for x in tab)
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for c in range(ncomp):
        sh, sv = samp[c]
        sof += bytes([c + 1, (sh << 4) | sv, qsel[c]])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_LUMA) + _dht_segment(1, 0, _AC_LUMA)
    if not gray:
        out += _dht_segment(0, 1, _DC_CHROMA) + _dht_segment(1, 1, _AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for c in range(ncomp):
        sel = 0 if qsel[c] == 0 else 1
        sos += bytes([c + 1, (sel << 4) | sel])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    bw = _BitWriter()
    preds = [0] * ncomp
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                out += bw.out
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                preds = [0] * ncomp
            for c in range(ncomp):
                sh, sv = samp[c]
                sel = 0 if qsel[c] == 0 else 1
                for by in range(sv):
                    for bx in range(sh):
                        blk = comp_blocks[c][my * sv + by, mx * sh + bx]
                        preds[c] = _encode_block(
                            bw, blk, preds[c], dc_codes[sel], ac_codes[sel]
                        )
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg(data: bytes) -> np.ndarray:
    """See ``_decode_jpeg_impl``. Malformed input of ANY shape raises
    JpegError: low-level struct/index/zlib failures from truncated or
    spliced payloads are re-raised typed, so callers' degrade paths
    (except JpegError/ValueError) always catch them."""
    try:
        return _decode_jpeg_impl(data)
    except (struct.error, IndexError) as exc:
        raise JpegError(f"malformed payload: {exc}") from None
