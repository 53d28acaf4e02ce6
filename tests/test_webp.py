"""Pure-Python VP8L (lossless WebP) codec.

Round trips cover the encoder's subtract-green literal path; the
decoder-only spec features (palette, predictor, cross-color, color
cache, LZ77 backrefs, meta prefix groups) are exercised with
HAND-BUILT bit streams whose expected pixels are computed by hand —
libwebp is not installed here, so these synthetic vectors are the
ground truth for internal consistency (see functions/webp.py caveat).
"""

import struct

import numpy as np
import pytest

from medical_and_charity_document_extraction_system_spark.functions import webp as W
from medical_and_charity_document_extraction_system_spark.functions.webp import (
    WebpError,
    decode_webp,
    encode_webp,
)


def _container(bw: "W._BitWriter") -> bytes:
    payload = b"\x2f" + bw.finish()
    vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        vp8l += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(vp8l)) + b"WEBP" + vp8l


def _header(bw: "W._BitWriter", w: int, h: int, alpha: int = 0) -> None:
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(alpha, 1)
    bw.write(0, 3)


def _zero_bit_dist_code(bw: "W._BitWriter") -> None:
    bw.write(1, 1)  # simple
    bw.write(0, 1)  # one symbol
    bw.write(0, 1)  # 1-bit symbol
    bw.write(0, 1)  # symbol 0


def _gray(h=13, w=29):
    return (np.arange(h * w, dtype=np.uint32) * 97 % 256).astype(np.uint8).reshape(h, w)


class TestRoundTrip:
    def test_gray_rgb_rgba(self):
        g = _gray()
        out = decode_webp(encode_webp(g))
        assert out.shape == (13, 29, 3)
        assert (out == np.repeat(g[:, :, None], 3, axis=2)).all()
        rgb = np.stack([g, 255 - g, g // 2], axis=2)
        assert (decode_webp(encode_webp(rgb)) == rgb).all()
        rgba = np.concatenate([rgb, (g // 3)[:, :, None]], axis=2)
        out = decode_webp(encode_webp(rgba))
        assert out.shape == (13, 29, 4) and (out == rgba).all()

    def test_deterministic_bytes(self):
        rgb = np.stack([_gray(), 255 - _gray(), _gray() // 2], axis=2)
        assert encode_webp(rgb) == encode_webp(rgb.copy())

    def test_odd_sizes(self):
        for h, w in [(1, 1), (1, 7), (5, 1), (3, 257)]:
            img = (np.arange(h * w) * 31 % 256).astype(np.uint8).reshape(h, w)
            assert (decode_webp(encode_webp(img))[:, :, 1] == img).all()

    def test_lossy_vp8_rejected_with_clear_message(self):
        body = b"\x00" * 10
        chunk = b"VP8 " + struct.pack("<I", len(body)) + body
        data = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
        with pytest.raises(WebpError, match="lossy"):
            decode_webp(data)

    def test_malformed_typed_errors(self):
        with pytest.raises(WebpError):
            decode_webp(b"RIFF\x00\x00\x00\x00WAVE")
        with pytest.raises(WebpError):
            decode_webp(b"not webp at all")
        good = encode_webp(_gray())
        with pytest.raises(WebpError):
            decode_webp(good[: len(good) // 2])


class TestHandBuiltStreams:
    def test_palette_transform_packed_indices(self):
        """4-color palette, 2-bit packed pixels (4 per byte)."""
        colors = [  # (a, r, g, b)
            (255, 10, 20, 30), (255, 40, 20, 90),
            (255, 0, 0, 0), (255, 200, 100, 50),
        ]
        idx = np.array([[0, 1, 2, 3, 0, 1, 2], [3, 3, 3, 3, 3, 3, 3]], np.uint8)
        h, w = idx.shape
        bw = W._BitWriter()
        _header(bw, w, h)
        bw.write(1, 1)  # transform present
        bw.write(3, 2)  # color indexing
        bw.write(len(colors) - 1, 8)
        deltas = np.diff(
            np.vstack([[0, 0, 0, 0], np.array(colors, np.int16)]), axis=0
        ).astype(np.uint8)
        W._write_image_stream(
            bw, deltas[:, 0], deltas[:, 1], deltas[:, 2], deltas[:, 3], main=False
        )
        bw.write(0, 1)  # no more transforms
        packed = np.zeros((h, (w + 3) // 4), np.uint8)
        for y in range(h):
            for x in range(w):
                packed[y, x // 4] |= idx[y, x] << (2 * (x % 4))
        flat = packed.ravel()
        zeros = np.zeros_like(flat)
        W._write_image_stream(bw, zeros, zeros, flat, zeros, main=True)
        out = decode_webp(_container(bw))
        expect = np.array([[colors[i][1:] for i in row] for row in idx], np.uint8)
        assert out.shape == (h, w, 3)
        assert (out == expect).all()

    def test_predictor_transform_top_mode(self):
        """Predictor mode 2 (Top), 1 tile; expected pixels hand-run."""
        w, h = 3, 2
        bw = W._BitWriter()
        _header(bw, w, h)
        bw.write(1, 1)
        bw.write(0, 2)  # predictor
        bw.write(0, 3)  # size_bits = 2 -> 4px tiles -> one tile
        one = np.array([0], np.uint8)
        W._write_image_stream(bw, one * 0, one * 0, np.array([2], np.uint8), one * 0, main=False)
        bw.write(0, 1)
        # residuals (a, r, g, b) per pixel, row-major
        res = np.array(
            [[0, 5, 6, 7], [0, 1, 1, 1], [0, 0, 0, 0],
             [0, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 0]], np.uint8
        )
        W._write_image_stream(bw, res[:, 0], res[:, 1], res[:, 2], res[:, 3], main=True)
        out = decode_webp(_container(bw))
        # (0,0): black pred (255,0,0,0)+res; row0 rest: Left; row1 x0: Top;
        # row1 x>0: mode 2 = Top
        expect = np.array(
            [[[5, 6, 7], [6, 7, 8], [6, 7, 8]],
             [[5, 6, 7], [7, 7, 8], [6, 7, 8]]], np.uint8
        )
        assert (out == expect).all()

    def test_cross_color_transform(self):
        """green_to_red = 16 (stored in the tile's blue channel):
        red += (16 * int8(green)) >> 5, hand-computed."""
        w, h = 2, 1
        bw = W._BitWriter()
        _header(bw, w, h)
        bw.write(1, 1)
        bw.write(1, 2)  # cross-color
        bw.write(0, 3)  # 4px tiles -> one tile
        one = np.array([0], np.uint8)
        W._write_image_stream(
            bw, one * 0, one * 0, one * 0, np.array([16], np.uint8), main=False
        )
        bw.write(0, 1)
        g = np.array([64, 200], np.uint8)   # int8: 64, -56
        r = np.array([10, 100], np.uint8)
        b = np.array([5, 9], np.uint8)
        a = np.array([0, 0], np.uint8)
        W._write_image_stream(bw, a, r, g, b, main=True)
        out = decode_webp(_container(bw))
        # (16*64)>>5 = 32 ; (16*-56)>>5 = floor(-896/32) = -28
        assert out[0, 0].tolist() == [42, 64, 5]
        assert out[0, 1].tolist() == [(100 - 28) & 0xFF, 200, 9]

    def test_color_cache(self):
        """Literal, cache hit, literal — the cache index is the spec
        hash of the inserted ARGB word."""
        w, h, cache_bits = 3, 1, 4
        g1, g3 = 77, 99
        argb1 = (255 << 24) | (g1 << 8)
        idx = ((0x1E35A7BD * argb1) & 0xFFFFFFFF) >> (32 - cache_bits)
        greens = np.array([g1, 256 + 24 + idx, g3], np.int64)
        bw = W._BitWriter()
        _header(bw, w, h)
        bw.write(0, 1)  # no transforms
        bw.write(1, 1)  # color cache
        bw.write(cache_bits, 4)
        bw.write(0, 1)  # no meta image
        zeros = np.zeros(2, np.uint8)
        a255 = np.full(2, 255, np.uint8)
        gcodes = W._channel_code(bw, greens, 256 + 24 + (1 << cache_bits))
        W._channel_code(bw, zeros, 256)   # red: singleton 0
        W._channel_code(bw, zeros, 256)   # blue
        W._channel_code(bw, a255, 256)    # alpha: singleton 255
        _zero_bit_dist_code(bw)
        W._emit_symbols(bw, greens, gcodes)
        out = decode_webp(_container(bw))
        assert out[0, 0].tolist() == [0, g1, 0]
        assert out[0, 1].tolist() == [0, g1, 0]  # served from the cache
        assert out[0, 2].tolist() == [0, g3, 0]

    def test_lz77_plane_code_row_copy(self):
        """Backref length=4 at plane code 1 -> (dx=0, dy=1) -> dist=w:
        row 1 copies row 0."""
        w, h = 4, 2
        greens = np.array([10, 11, 12, 13, 256 + 3], np.int64)  # len code 3 -> 4
        bw = W._BitWriter()
        _header(bw, w, h)
        bw.write(0, 1)
        bw.write(0, 1)  # no cache
        bw.write(0, 1)  # no meta
        zeros = np.zeros(2, np.uint8)
        gcodes = W._channel_code(bw, greens, 256 + 24)
        W._channel_code(bw, zeros, 256)
        W._channel_code(bw, zeros, 256)
        W._channel_code(bw, np.full(2, 255, np.uint8), 256)
        _zero_bit_dist_code(bw)  # dist symbol 0 -> prefix value 1 -> plane 1
        W._emit_symbols(bw, greens, gcodes)
        out = decode_webp(_container(bw))
        assert out[:, :, 1].tolist() == [[10, 11, 12, 13], [10, 11, 12, 13]]
        assert W._DIST_MAP[0] == (0, 1)

    def test_lz77_direct_distance(self):
        """Distance code 121 -> direct dist 1 (copy left pixel):
        dist prefix symbol 13 + 5 extra bits (value 24)."""
        w, h = 3, 1
        # one literal + two length-1 backrefs = 3 pixels
        greens = np.array([50, 256 + 0, 256 + 0], np.int64)
        bw = W._BitWriter()
        _header(bw, w, h)
        bw.write(0, 1)
        bw.write(0, 1)
        bw.write(0, 1)
        zeros = np.zeros(2, np.uint8)
        gcodes = W._channel_code(bw, greens, 256 + 24)
        W._channel_code(bw, zeros, 256)
        W._channel_code(bw, zeros, 256)
        W._channel_code(bw, np.full(2, 255, np.uint8), 256)
        # distance code tree: single symbol 13 (zero-bit)
        bw.write(1, 1)
        bw.write(0, 1)
        bw.write(1, 1)
        bw.write(13, 8)
        # pixels: literal 50, then two (len, dist) backrefs
        W._emit_symbols(bw, [50], gcodes)
        for _ in range(2):
            W._emit_symbols(bw, [256], gcodes)
            # dist symbol 13 is zero-bit; its 5 extra bits follow:
            # value = 96 + extra + 1 = 121 -> direct dist 121-120 = 1
            bw.write(24, 5)
        out = decode_webp(_container(bw))
        assert out[0, :, 1].tolist() == [50, 50, 50]

    def test_meta_prefix_groups(self):
        """Two prefix-code groups selected by a 4px-tile entropy image:
        left half decodes green 21, right half 22 — all zero-bit."""
        w, h = 8, 1
        bw = W._BitWriter()
        _header(bw, w, h)
        bw.write(0, 1)  # no transforms
        bw.write(0, 1)  # no cache
        bw.write(1, 1)  # meta prefix image present
        bw.write(0, 3)  # meta_bits = 2 -> 4px tiles -> 2 tiles
        tz = np.zeros(2, np.uint8)
        W._write_image_stream(
            bw, tz, tz, np.array([0, 1], np.uint8), tz, main=False
        )
        for green in (21, 22):
            W._channel_code(bw, np.full(4, green, np.int64), 256 + 24)
            W._channel_code(bw, tz, 256)
            W._channel_code(bw, tz, 256)
            W._channel_code(bw, np.full(2, 255, np.uint8), 256)
            _zero_bit_dist_code(bw)
        out = decode_webp(_container(bw))
        assert out[0, :, 1].tolist() == [21] * 4 + [22] * 4




class TestImageioRouting:
    def test_sniff_and_round_trip(self):
        from medical_and_charity_document_extraction_system_spark.functions import imageio

        img = _gray(16, 16)
        payload = imageio.encode_as(img, "webp")
        assert imageio.sniff_format(payload) == "webp"
        dec, fmt = imageio.decode_auto(payload)
        assert fmt == "webp" and dec.shape == (16, 16, 3)
        assert (dec[:, :, 0] == img).all()


def test_predictor13_truncates_toward_zero_like_c():
    """VP8L ClampAddSubtractHalf is Clamp(a + (a - b) / 2) with C
    integer division (truncation toward zero); a floor-division
    implementation is off by one whenever ave < TL (negative delta).
    Regression for the d // 2 bug."""
    import numpy as np

    from medical_and_charity_document_extraction_system_spark.functions.webp import (
        _inverse_predictor,
    )

    # 2x2, one tile, mode 13 everywhere (only pixel (1,1) uses it:
    # row 0 predicts from L, column 0 from T)
    tiles = np.zeros((1, 1, 4), np.uint8)
    tiles[0, 0, 2] = 13
    px = np.zeros((2, 2, 4), np.uint8)
    # reconstruct: (0,0)=residual+[255,0,0,0]; choose residuals so at
    # (1,1): ave=avg2(L,T) < TL in some channel with ODD delta
    px[0, 0] = [0, 10, 10, 10]      # -> TL = [255,10,10,10]
    px[0, 1] = [0, 3, 3, 3]         # -> T  = TL + r = [255,13,13,13]
    px[1, 0] = [0, 0, 0, 0]         # -> L  = TL + r = [255,10,10,10]
    px[1, 1] = [0, 0, 0, 0]         # residual 0 -> out = pred
    out = _inverse_predictor(px, 1, tiles)
    # channel 1..3: L=10, T=13 -> ave=11; d=11-10=1 -> +0 -> 11 (same
    # under floor and trunc). Alpha: L=T=255 -> ave=255, TL=255, d=0.
    # Now force a NEGATIVE odd delta: ave=11, TL=13 needs TL bigger.
    tiles2 = tiles.copy()
    px2 = np.zeros((2, 2, 4), np.uint8)
    px2[0, 0] = [0, 13, 13, 13]     # TL = [255,13,13,13]
    px2[0, 1] = [0, 255, 255, 255]  # T = TL - 1 = [255,12,12,12] (mod 256)
    px2[1, 0] = [0, 253, 253, 253]  # L = TL - 3 = [255,10,10,10]
    px2[1, 1] = [0, 0, 0, 0]
    out2 = _inverse_predictor(px2, 1, tiles2)
    # ave = (10+12)//2 = 11, TL = 13, d = -2 -> -1 either way: 10.
    # Make d odd instead: redo with TL = 14.
    px3 = px2.copy()
    px3[0, 0] = [0, 14, 14, 14]     # TL = 14
    px3[0, 1] = [0, 254, 254, 254]  # T = 12
    px3[1, 0] = [0, 252, 252, 252]  # L = 10
    out3 = _inverse_predictor(px3, 1, tiles2)
    # ave = 11, d = 11 - 14 = -3: C trunc -> 11 + (-1) = 10;
    # floor division would give 11 + (-2) = 9.
    assert list(out3[1, 1][1:]) == [10, 10, 10], out3[1, 1]
    # sanity on the non-negative-delta cases
    assert list(out[1, 1][1:]) == [11, 11, 11]
    assert list(out2[1, 1][1:]) == [10, 10, 10]
