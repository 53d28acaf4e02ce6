"""Pure-Python baseline TIFF codec — stdlib + numpy.

The reference accepts ``.tiff``/``.tif`` uploads through cv2
(/root/reference/backend/app/utils/file_utils.py:271-273,129-173);
no cv2/PIL here, so this is written from the public TIFF 6.0 spec.

Decoder: both byte orders (II/MM), first IFD, baseline tags
(ImageWidth/ImageLength/BitsPerSample/Compression/Photometric/
StripOffsets/SamplesPerPixel/RowsPerStrip/StripByteCounts/
PlanarConfiguration/Predictor), Compression none, Deflate (8 and the
old Adobe tag 32946) and PackBits (32773), with the horizontal
predictor; 8-bit grayscale (photometric 0/1, MinIsBlack and
MinIsWhite) and 8-bit RGB, chunky planar config, any strip layout.
LZW/CCITT/JPEG-in-TIFF raise a typed error.

Encoder: little-endian, uncompressed, single strip, deterministic
bytes (same pixels, same bytes).
"""

from __future__ import annotations

import struct

import numpy as np


class TiffError(ValueError):
    pass


TIFF_MAGIC_LE = b"II*\x00"
TIFF_MAGIC_BE = b"MM\x00*"

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I"}


def _read_tag_values(data: bytes, bo: str, ttype: int, count: int, payload: bytes):
    size = _TYPE_SIZE.get(ttype)
    if size is None:
        raise TiffError(f"unsupported tag type {ttype}")
    total = size * count
    if total <= 4:
        raw = payload[:total]
    else:
        off = struct.unpack(bo + "I", payload)[0]
        raw = data[off : off + total]
        if len(raw) < total:
            raise TiffError("tag value offset out of range")
    if ttype == 5:  # RATIONAL
        vals = struct.unpack(bo + "II" * count, raw)
        return [vals[i] / max(vals[i + 1], 1) for i in range(0, 2 * count, 2)]
    if ttype == 2:  # ASCII
        return [raw.rstrip(b"\x00").decode("latin-1")]
    return list(struct.unpack(bo + _TYPE_FMT[ttype] * count, raw))


def _unpackbits(data: bytes) -> bytes:
    """PackBits RLE (TIFF spec section 9): n in 0..127 copies n+1
    literal bytes; n in -127..-1 repeats the next byte 1-n times;
    -128 is a no-op."""
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= len(data):
                raise TiffError("truncated PackBits run")
            out += data[i : i + 1] * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out)


def _decode_impl(data: bytes) -> np.ndarray:
    data = bytes(data)
    if data[:4] == TIFF_MAGIC_LE:
        bo = "<"
    elif data[:4] == TIFF_MAGIC_BE:
        bo = ">"
    else:
        raise TiffError("not a TIFF payload")
    ifd_off = struct.unpack_from(bo + "I", data, 4)[0]
    if ifd_off + 2 > len(data):
        raise TiffError("truncated IFD offset")
    n_tags = struct.unpack_from(bo + "H", data, ifd_off)[0]
    tags: dict[int, list] = {}
    for i in range(n_tags):
        ent = ifd_off + 2 + 12 * i
        if ent + 12 > len(data):
            raise TiffError("truncated IFD")
        tag, ttype, count = struct.unpack_from(bo + "HHI", data, ent)
        try:
            tags[tag] = _read_tag_values(
                data, bo, ttype, count, data[ent + 8 : ent + 12]
            )
        except TiffError:
            raise
        except Exception:
            continue  # skip unreadable ancillary tags

    def one(tag: int, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise TiffError(f"missing required tag {tag}")
            return default
        return v[0]

    width = int(one(256))
    height = int(one(257))
    compression = int(one(259, 1))
    photometric = int(one(262, 1))
    spp = int(one(277, 1))
    planar = int(one(284, 1))
    predictor = int(one(317, 1))
    bits = tags.get(258, [8])
    if compression not in (1, 8, 32946, 32773):
        # 1=none, 8/32946=Deflate (Adobe/old tag), 32773=PackBits;
        # LZW/CCITT/JPEG-in-TIFF need codec machinery out of scope
        raise TiffError(f"compressed TIFF (method {compression}) unsupported")
    if planar != 1:
        raise TiffError("planar TIFF unsupported")
    if any(int(b) != 8 for b in bits) or spp not in (1, 3):
        raise TiffError(f"unsupported sample layout bits={bits} spp={spp}")
    if photometric not in (0, 1, 2):
        raise TiffError(f"unsupported photometric {photometric}")
    if width <= 0 or height <= 0:
        raise TiffError("bad TIFF dimensions")
    offsets = [int(v) for v in tags.get(273, [])]
    counts = [int(v) for v in tags.get(279, [])]
    if not offsets:
        raise TiffError("missing strip offsets")
    if not counts:
        counts = [width * height * spp]  # single full strip
    if len(counts) != len(offsets):
        raise TiffError("strip offset/count mismatch")
    body = bytearray()
    for off, cnt in zip(offsets, counts):
        chunk = data[off : off + cnt]
        if len(chunk) < cnt:
            raise TiffError("truncated strip data")
        if compression in (8, 32946):
            import zlib

            try:
                chunk = zlib.decompress(chunk)
            except zlib.error as exc:
                raise TiffError(f"bad Deflate strip: {exc}") from None
        elif compression == 32773:
            chunk = _unpackbits(chunk)
        body += chunk
    need = width * height * spp
    if len(body) < need:
        raise TiffError("strip data shorter than image")
    arr = np.frombuffer(bytes(body[:need]), np.uint8)
    if predictor == 2:  # horizontal differencing (common with Deflate)
        rows = arr.reshape(height, width, spp).astype(np.int64)
        arr = (np.cumsum(rows, axis=1) & 0xFF).astype(np.uint8).ravel()
    elif predictor != 1:
        raise TiffError(f"unsupported TIFF predictor {predictor}")
    if spp == 1:
        img = arr.reshape(height, width)
        if photometric == 0:  # MinIsWhite
            img = (255 - img.astype(np.int16)).astype(np.uint8)
        return np.ascontiguousarray(img)
    return np.ascontiguousarray(arr.reshape(height, width, 3))


def _pack_ifd_entry(tag: int, ttype: int, count: int, value: int) -> bytes:
    return struct.pack("<HHI", tag, ttype, count) + struct.pack("<I", value)


def encode_tiff(image: np.ndarray) -> bytes:
    image = np.ascontiguousarray(np.asarray(image, np.uint8))
    if image.ndim == 2:
        h, w = image.shape
        spp, photometric = 1, 1
    elif image.ndim == 3 and image.shape[2] == 3:
        h, w = image.shape[:2]
        spp, photometric = 3, 2
    else:
        raise TiffError("image must be gray (H, W) or RGB (H, W, 3)")
    pixels = image.tobytes()
    entries = []  # (tag, type, count, value_or_deferred)
    # layout: header(8) + pixels + [bits array for RGB] + IFD
    pix_off = 8
    extra_off = pix_off + len(pixels)
    extra = b""
    if spp == 3:
        bits_value = extra_off
        extra = struct.pack("<HHH", 8, 8, 8)
    else:
        bits_value = 8
    ifd_off = extra_off + len(extra)
    entries = [
        _pack_ifd_entry(256, 4, 1, w),
        _pack_ifd_entry(257, 4, 1, h),
        _pack_ifd_entry(258, 3, spp, bits_value),
        _pack_ifd_entry(259, 3, 1, 1),
        _pack_ifd_entry(262, 3, 1, photometric),
        _pack_ifd_entry(273, 4, 1, pix_off),
        _pack_ifd_entry(277, 3, 1, spp),
        _pack_ifd_entry(278, 4, 1, h),
        _pack_ifd_entry(279, 4, 1, len(pixels)),
        _pack_ifd_entry(284, 3, 1, 1),
    ]
    out = bytearray()
    out += TIFF_MAGIC_LE + struct.pack("<I", ifd_off)
    out += pixels
    out += extra
    out += struct.pack("<H", len(entries))
    for e in entries:
        out += e
    out += struct.pack("<I", 0)  # no next IFD
    return bytes(out)


def decode_tiff(data: bytes) -> np.ndarray:
    """TIFF bytes -> gray (H, W) or RGB (H, W, 3) uint8. Malformed
    input of any shape raises TiffError."""
    try:
        return _decode_impl(data)
    except (struct.error, IndexError) as exc:
        raise TiffError(f"malformed payload: {exc}") from None
