"""Pure-Python BMP codec (Windows BITMAPINFOHEADER) — stdlib + numpy.

The reference accepts ``.bmp`` uploads and loads them through cv2
(/root/reference/backend/app/utils/file_utils.py:271-273,129-173);
this container has no cv2/PIL, so the codec is written from the public
file-format spec (Microsoft BMP, BITMAPINFOHEADER).

Decoder: 'BM' file header + 40/52/56/108/124-byte info headers,
uncompressed BI_RGB only, bit depths 8 (paletted — grayscale palettes
collapse to (H, W) gray, color palettes expand to RGB), 24 (BGR) and
32 (BGRA, alpha dropped); bottom-up and top-down (negative height)
row order; 4-byte row padding.

Encoder: gray (H, W) -> 8-bit with a grayscale palette,
RGB (H, W, 3) -> 24-bit BGR; always bottom-up BITMAPINFOHEADER,
deterministic bytes (same pixels, same bytes).
"""

from __future__ import annotations

import struct

import numpy as np


class BmpError(ValueError):
    pass


BMP_MAGIC = b"BM"


def _decode_impl(data: bytes) -> np.ndarray:
    data = bytes(data)
    if data[:2] != BMP_MAGIC or len(data) < 54:
        raise BmpError("not a BMP payload")
    pix_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise BmpError(f"unsupported BMP header size {hdr_size} (need >=40)")
    width, height = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    palette_n = struct.unpack_from("<I", data, 46)[0]
    if planes != 1:
        raise BmpError(f"bad plane count {planes}")
    if compression != 0:
        raise BmpError(f"compressed BMP (method {compression}) unsupported")
    if bpp not in (8, 24, 32):
        raise BmpError(f"unsupported bit depth {bpp}")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height <= 0:
        raise BmpError("bad BMP dimensions")

    palette = None
    if bpp == 8:
        n = palette_n or 256
        pal_off = 14 + hdr_size
        raw = data[pal_off : pal_off + 4 * n]
        if len(raw) < 4 * n:
            raise BmpError("truncated palette")
        # entries are BGRX
        palette = np.frombuffer(raw, np.uint8).reshape(n, 4)[:, [2, 1, 0]]

    row_bytes = (width * bpp // 8 + 3) & ~3
    need = row_bytes * height
    body = data[pix_off : pix_off + need]
    if len(body) < need:
        raise BmpError("truncated pixel data")
    rows = np.frombuffer(body, np.uint8).reshape(height, row_bytes)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        idx = rows[:, :width]
        if int(idx.max(initial=0)) >= len(palette):
            raise BmpError("palette index out of range")
        rgb = palette[idx]
        if bool((rgb[:, :, 0] == rgb[:, :, 1]).all() and (rgb[:, :, 1] == rgb[:, :, 2]).all()):
            return np.ascontiguousarray(rgb[:, :, 0])
        return np.ascontiguousarray(rgb)
    step = bpp // 8
    px = rows[:, : width * step].reshape(height, width, step)
    return np.ascontiguousarray(px[:, :, [2, 1, 0]])  # BGR(A) -> RGB


def encode_bmp(image: np.ndarray) -> bytes:
    image = np.ascontiguousarray(np.asarray(image, np.uint8))
    if image.ndim == 2:
        h, w = image.shape
        row_bytes = (w + 3) & ~3
        pal = bytearray()
        for v in range(256):
            pal += bytes((v, v, v, 0))
        body = bytearray()
        pad = b"\x00" * (row_bytes - w)
        for y in range(h - 1, -1, -1):
            body += image[y].tobytes() + pad
        pix_off = 14 + 40 + 1024
        bpp, palette_n = 8, 256
        pal_bytes = bytes(pal)
    elif image.ndim == 3 and image.shape[2] == 3:
        h, w = image.shape[:2]
        row_bytes = (w * 3 + 3) & ~3
        bgr = image[:, :, [2, 1, 0]]
        body = bytearray()
        pad = b"\x00" * (row_bytes - w * 3)
        for y in range(h - 1, -1, -1):
            body += bgr[y].tobytes() + pad
        pix_off = 14 + 40
        bpp, palette_n = 24, 0
        pal_bytes = b""
    else:
        raise BmpError("image must be gray (H, W) or RGB (H, W, 3)")
    size = pix_off + len(body)
    out = bytearray()
    out += BMP_MAGIC + struct.pack("<IHHI", size, 0, 0, pix_off)
    out += struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(body), 2835, 2835, palette_n, 0
    )
    out += pal_bytes
    out += body
    return bytes(out)


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes -> gray (H, W) or RGB (H, W, 3) uint8. Malformed input
    of any shape raises BmpError so callers' degrade paths catch it."""
    try:
        return _decode_impl(data)
    except (struct.error, IndexError) as exc:
        raise BmpError(f"malformed payload: {exc}") from None
