"""Pure-Python PNG codec tests.

The decoder must handle files OUR encoder never writes (filters 1-4,
Adam7 interlace, sub-byte depths, palette, 16-bit), so these tests
build those streams by hand from the spec (filtering is the exact
inverse of reconstruction) and assert the decoder inverts them.
"""

import struct
import zlib

import numpy as np
import pytest

from medical_and_charity_document_extraction_system_spark.functions.png import (
    PNG_MAGIC,
    PngError,
    decode_png,
    encode_png,
    to_gray_u8,
)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _paeth(a, b, c):
    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def _filter_rows(rows: np.ndarray, bpp: int, ftype) -> bytes:
    """Apply spec filters (the encoder side) row by row; ftype is an
    int or a per-row callable(y) -> int."""
    h, rowbytes = rows.shape
    out = bytearray()
    prev = np.zeros(rowbytes, dtype=np.int32)
    for y in range(h):
        ft = ftype(y) if callable(ftype) else ftype
        cur = rows[y].astype(np.int32)
        filt = np.empty(rowbytes, dtype=np.int32)
        for i in range(rowbytes):
            a = int(cur[i - bpp]) if i >= bpp else 0
            b = int(prev[i])
            c = int(prev[i - bpp]) if i >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                pred = _paeth(a, b, c)
            filt[i] = (cur[i] - pred) & 0xFF
        out.append(ft)
        out += filt.astype(np.uint8).tobytes()
        prev = cur
    return bytes(out)


def _build_png(
    width, height, depth, ctype_n, raw_scanlines: bytes, plte: bytes = b"",
    interlace: int = 0,
) -> bytes:
    ihdr = struct.pack(">IIBBBBB", width, height, depth, ctype_n, 0, 0, interlace)
    body = PNG_MAGIC + _chunk(b"IHDR", ihdr)
    if plte:
        body += _chunk(b"PLTE", plte)
    body += _chunk(b"IDAT", zlib.compress(raw_scanlines, 6))
    return body + _chunk(b"IEND", b"")


def test_all_filters_rgb():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (9, 5, 3), dtype=np.uint8)
    rows = img.reshape(9, 15)
    # cycle every filter type across rows
    raw = _filter_rows(rows, bpp=3, ftype=lambda y: y % 5)
    data = _build_png(5, 9, 8, 2, raw)
    assert (decode_png(data) == img).all()


def test_all_filters_gray16():
    rng = np.random.RandomState(4)
    img = rng.randint(0, 65536, (6, 4), dtype=np.uint16)
    rows = img[:, :, None].astype(">u2").view(np.uint8).reshape(6, 8)
    raw = _filter_rows(rows, bpp=2, ftype=lambda y: (y + 2) % 5)
    data = _build_png(4, 6, 16, 0, raw)
    out = decode_png(data)
    assert out.dtype == np.uint16 and (out == img).all()


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_subbyte_gray_scaled(depth):
    maxv = (1 << depth) - 1
    w, h = 11, 3  # 11 samples does not fill whole bytes at d=1,2
    vals = np.arange(w * h).reshape(h, w) % (maxv + 1)
    per_byte = 8 // depth
    rows = []
    for y in range(h):
        packed = bytearray()
        for i in range(0, w, per_byte):
            byte = 0
            for j, v in enumerate(vals[y, i : i + per_byte]):
                byte |= int(v) << (8 - depth * (j + 1))
            packed.append(byte)
        rows.append(bytes(packed))
    rowbytes = len(rows[0])
    arr = np.frombuffer(b"".join(rows), np.uint8).reshape(h, rowbytes)
    raw = _filter_rows(arr, bpp=1, ftype=0)
    data = _build_png(w, h, depth, 0, raw)
    expect = (vals * (255 // maxv)).astype(np.uint8)
    assert (decode_png(data) == expect).all()


def test_palette():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    idx = np.array([[0, 1, 2], [3, 2, 1]], dtype=np.uint8)
    raw = _filter_rows(idx, bpp=1, ftype=1)
    data = _build_png(3, 2, 8, 3, raw, plte=plte)
    out = decode_png(data)
    pal = np.frombuffer(plte, np.uint8).reshape(4, 3)
    assert (out == pal[idx]).all()


def test_palette_index_out_of_range_rejected():
    plte = bytes([1, 2, 3])
    idx = np.array([[5]], dtype=np.uint8)
    data = _build_png(1, 1, 8, 3, _filter_rows(idx, 1, 0), plte=plte)
    with pytest.raises(PngError, match="palette index"):
        decode_png(data)


def test_adam7_interlace_rgba():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (10, 13, 4), dtype=np.uint8)
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        ph, pw = sub.shape[:2]
        rows = sub.reshape(ph, pw * 4)
        raw += _filter_rows(rows, bpp=4, ftype=lambda y: (y * 3) % 5)
    data = _build_png(13, 10, 8, 6, bytes(raw), interlace=1)
    assert (decode_png(data) == img).all()


def test_crc_mismatch_rejected_and_skippable():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    data = bytearray(encode_png(img))
    data[-1] ^= 0xFF  # corrupt IEND crc (last 4 bytes of the stream)
    with pytest.raises(PngError, match="CRC"):
        decode_png(bytes(data))
    assert (decode_png(bytes(data), check_crc=False) == img).all()


def test_truncated_and_garbage_rejected():
    with pytest.raises(PngError):
        decode_png(b"not a png at all")
    full = encode_png(np.zeros((4, 4), np.uint8))
    with pytest.raises(PngError):
        decode_png(full[:20])


def test_multiple_idat_chunks():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    scan = np.zeros((8, 9), dtype=np.uint8)
    scan[:, 1:] = img
    comp = zlib.compress(scan.tobytes(), 6)
    ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 0)
    data = (
        PNG_MAGIC + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", comp[:10]) + _chunk(b"IDAT", comp[10:])
        + _chunk(b"IEND", b"")
    )
    assert (decode_png(data) == img).all()


def test_encoder_deterministic_and_gray_alpha():
    rng = np.random.RandomState(6)
    img = rng.randint(0, 256, (7, 5, 2), dtype=np.uint8)
    a, b = encode_png(img), encode_png(img)
    assert a == b
    out = decode_png(a)
    assert out.shape == (7, 5, 2) and (out == img).all()
    assert (to_gray_u8(out) == img[:, :, 0]).all()


def test_to_gray_u8_luma():
    img = np.zeros((1, 3, 3), np.uint8)
    img[0, 0] = [255, 0, 0]
    img[0, 1] = [0, 255, 0]
    img[0, 2] = [10, 20, 30]
    g = to_gray_u8(img)
    assert g[0, 0] == (299 * 255 + 500) // 1000
    assert g[0, 1] == (587 * 255 + 500) // 1000
    assert g[0, 2] == (299 * 10 + 587 * 20 + 114 * 30 + 500) // 1000


def test_rgb16_roundtrip_via_handbuilt_stream():
    rng = np.random.RandomState(9)
    img = rng.randint(0, 65536, (5, 4, 3), dtype=np.uint16)
    rows = img.astype(">u2").reshape(5, -1).view(np.uint8).reshape(5, 24)
    raw = _filter_rows(rows, bpp=6, ftype=lambda y: y % 5)
    data = _build_png(4, 5, 16, 2, raw)
    out = decode_png(data)
    assert out.dtype == np.uint16 and (out == img).all()


@pytest.mark.parametrize("depth", [2, 4])
def test_subbyte_palette(depth):
    """Palette indices below 8 bits: unpacked but NOT scaled (scaling
    applies to gray samples only)."""
    n = 1 << depth
    plte = bytes(range(3 * n))
    w, h = 5, 2
    vals = (np.arange(w * h).reshape(h, w) % n).astype(np.uint8)
    per_byte = 8 // depth
    rows = []
    for y in range(h):
        packed = bytearray()
        for i in range(0, w, per_byte):
            byte = 0
            for j, v in enumerate(vals[y, i : i + per_byte]):
                byte |= int(v) << (8 - depth * (j + 1))
            packed.append(byte)
        rows.append(bytes(packed))
    arr = np.frombuffer(b"".join(rows), np.uint8).reshape(h, len(rows[0]))
    raw = _filter_rows(arr, bpp=1, ftype=0)
    data = _build_png(w, h, depth, 3, raw, plte=plte)
    pal = np.frombuffer(plte, np.uint8).reshape(n, 3)
    assert (decode_png(data) == pal[vals]).all()
