"""Format-sniffing image decode/encode for binary image columns.

The pipeline's image stages (operators/preprocess.py,
operators/multimodal.py) accept any supported container and emit their
output in the SAME container they were fed — netpbm (P5/P6), PNG
(functions/png.py), baseline JPEG (functions/jpeg.py), GIF
(functions/gif.py, first frame), BMP (functions/bmp.py) and
uncompressed TIFF (functions/tiff.py), all pure Python. This covers
EVERY image suffix the reference accepts
(/root/reference/backend/app/utils/file_utils.py:271-273) —
jpg/jpeg/png/bmp/tiff/tif/webp — plus netpbm and GIF. Lossy WebP
(VP8 intra coding, a full video codec) is the one remaining gated
shape inside the .webp suffix and degrades to a clear error row;
reference analog loads any cv2-readable format
(file_utils.py:129-173).
"""

from __future__ import annotations

import numpy as np

from . import bmp, gif, jpeg, netpbm, png, tiff, webp

FORMAT_PNG = "png"
FORMAT_NETPBM = "netpbm"
FORMAT_JPEG = "jpeg"
FORMAT_GIF = "gif"
FORMAT_BMP = "bmp"
FORMAT_TIFF = "tiff"
FORMAT_WEBP = "webp"

_JPEG_MAGIC = b"\xff\xd8\xff"

# fixed output quality: encode_as must be deterministic (same pixels,
# same bytes), so the writer side pins every knob
_JPEG_OUT_QUALITY = 90


def sniff_format(payload: bytes) -> str | None:
    """Container by magic bytes; None when unrecognized."""
    if payload.startswith(png.PNG_MAGIC):
        return FORMAT_PNG
    if payload[:2] in (b"P5", b"P6"):
        return FORMAT_NETPBM
    if payload.startswith(_JPEG_MAGIC):
        return FORMAT_JPEG
    if payload[:6] in gif.GIF_MAGIC:
        return FORMAT_GIF
    if payload[:2] == bmp.BMP_MAGIC and len(payload) >= 54:
        return FORMAT_BMP
    if payload[:4] in (tiff.TIFF_MAGIC_LE, tiff.TIFF_MAGIC_BE):
        return FORMAT_TIFF
    if payload[:4] == webp.RIFF_MAGIC and payload[8:12] == webp.WEBP_MAGIC:
        return FORMAT_WEBP
    return None


def decode_auto(payload: bytes) -> tuple[np.ndarray, str]:
    """bytes -> (ndarray, format). Results are collapsed to the shapes
    the numpy kernels understand: gray (H,W) or RGB (H,W,3) uint8
    (16-bit PNG scaled down, alpha dropped, GIF first frame)."""
    payload = bytes(payload)
    fmt = sniff_format(payload)
    if fmt == FORMAT_NETPBM:
        return netpbm.decode(payload), fmt
    if fmt == FORMAT_JPEG:
        return jpeg.decode_jpeg(payload), fmt
    if fmt == FORMAT_GIF:
        return gif.decode_gif(payload)[0], fmt
    if fmt == FORMAT_BMP:
        return bmp.decode_bmp(payload), fmt
    if fmt == FORMAT_TIFF:
        return tiff.decode_tiff(payload), fmt
    if fmt == FORMAT_WEBP:
        img = webp.decode_webp(payload)
        if img.ndim == 3 and img.shape[2] == 4:  # RGBA -> RGB
            img = np.ascontiguousarray(img[:, :, :3])
        return img, fmt
    if fmt == FORMAT_PNG:
        img = png.decode_png(payload)
        if img.dtype == np.uint16:
            img = (img >> 8).astype(np.uint8)
        if img.ndim == 3 and img.shape[2] == 2:  # gray+alpha -> gray
            img = img[:, :, 0]
        elif img.ndim == 3 and img.shape[2] == 4:  # RGBA -> RGB
            img = img[:, :, :3]
        return img, fmt
    raise ValueError(
        "unrecognized image container (not PNG/JPEG/GIF/BMP/TIFF/WebP/netpbm)"
    )


def encode_as(image: np.ndarray, fmt: str) -> bytes:
    """ndarray -> bytes in the given container (round-trips the format
    the stage was fed, so PNG/JPEG corpora stay PNG/JPEG end-to-end).
    JPEG is lossy by nature; quality is pinned for determinism. GIF is
    palette-bound (RGB, <=256 distinct colors), so gray inputs are
    expanded — a decoded GIF therefore comes back as (H, W, 3)."""
    if fmt == FORMAT_PNG:
        return png.encode_png(image)
    if fmt == FORMAT_NETPBM:
        return netpbm.encode(image)
    if fmt == FORMAT_JPEG:
        return jpeg.encode_jpeg(image, quality=_JPEG_OUT_QUALITY)
    if fmt == FORMAT_GIF:
        arr = np.asarray(image, np.uint8)
        if arr.ndim == 2:
            arr = np.repeat(arr[:, :, None], 3, axis=2)
        return gif.encode_gif([arr])
    if fmt == FORMAT_BMP:
        return bmp.encode_bmp(image)
    if fmt == FORMAT_TIFF:
        return tiff.encode_tiff(image)
    if fmt == FORMAT_WEBP:
        return webp.encode_webp(image)
    raise ValueError(f"unknown image format {fmt!r}")
