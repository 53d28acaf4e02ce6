"""Pure-Python WebP *lossless* (VP8L) codec — stdlib + numpy.

Closes the last image suffix the reference accepts
(/root/reference/backend/app/utils/file_utils.py:271-273) that this
container couldn't read: ``.webp``. Written from the public "WebP
Lossless Bitstream Specification" (RFC-style, Google 2012-2023).
Lossy WebP (VP8 intra coding) is a full video-intra codec and stays
gated — a lossy ``VP8 `` chunk raises with a clear message.

Decoder (full VP8L):
- RIFF/WEBP/VP8L container, 14-bit dims, LSB-first bit stream
- all four transforms, applied inverse in reverse order: predictor
  (14 modes, tiled), cross-color (signed 3.5 fixed-point deltas),
  subtract-green, color-indexing (palette, incl. sub-byte pixel
  packing for <=16 colors)
- entropy image (meta prefix groups), color cache (hash 0x1e35a7bd),
  canonical prefix codes (simple 1/2-symbol and full code-length
  coded forms, incl. 16/17/18 repeats and the max_symbol short-cut)
- LZ77 backward references with the length/distance prefix coding and
  the short-distance plane-code neighbour map

Encoder (deterministic bytes; a valid-but-simple VP8L writer):
- subtract-green transform (gray/palette-ish corpora collapse red and
  blue to constants: their prefix codes become zero-bit singletons)
- literal-only coding (no LZ77 search) with canonical prefix codes,
  full code-length coding, single group, no color cache
- gray (H, W), RGB (H, W, 3) and RGBA (H, W, 4) uint8 inputs;
  decode returns (H, W, 3) or (H, W, 4) (gray comes back RGB —
  VP8L is an ARGB format; imageio collapses equal channels).

CAVEAT (documented, not hidden): the 120-entry short-distance
plane-code table is reproduced from the spec's published ordering
(ascending x²+y², then larger y, then larger x, over the published
neighbourhood domain). libwebp is not installed in this container, so
cross-implementation decoding of THAT path cannot be validated here;
it is exercised by this module's own LZ77-emitting test vectors
(tests/test_webp.py) for internal consistency.
"""

from __future__ import annotations

import struct

import numpy as np


class WebpError(ValueError):
    pass


RIFF_MAGIC = b"RIFF"
WEBP_MAGIC = b"WEBP"

_CACHE_MULT = 0x1E35A7BD

# short-distance plane-code neighbour map: (dx, dy) pairs, spec order
# (see module docstring caveat). Domain: dy 0..7 with dx -8..8 (dy=0
# restricted to dx>=1); sorted by squared distance, then dy
# descending, then dx descending; first 120 entries.
_DIST_MAP: list[tuple[int, int]] = sorted(
    (
        (dx, dy)
        for dy in range(0, 8)
        for dx in range(-8, 9)
        if dy > 0 or dx >= 1
    ),
    key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]),
)[:120]


# ------------------------------------------------------------ bit I/O
class _BitReader:
    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise WebpError("bit stream exhausted")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        return v


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc, self.nbits = 0, 0
        return bytes(self.out)


# ----------------------------------------------------- prefix codes
class _PrefixCode:
    """Canonical prefix code (DEFLATE convention: codes assigned in
    (length, symbol) order, bits consumed MSB-first). Decoded via a
    flat peek table of max_len bits — one dict hit per symbol."""

    __slots__ = ("table", "max_len", "single")

    def __init__(self, lengths: list[int]) -> None:
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise WebpError("prefix code with no symbols")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.table = None
            self.max_len = 0
            return
        self.single = None
        nz.sort()
        # kraft check + canonical assignment
        code = 0
        prev_len = nz[0][0]
        codes = []
        for ln, sym in nz:
            code <<= ln - prev_len
            prev_len = ln
            codes.append((sym, ln, code))
            code += 1
        if code > (1 << prev_len):
            raise WebpError("over-subscribed prefix code")
        self.max_len = max(ln for ln, _ in nz)
        table = {}
        for sym, ln, c in codes:
            # every max_len-bit word whose top ln bits equal the code
            pad = self.max_len - ln
            base = c << pad
            for fill in range(1 << pad):
                table[base | fill] = (sym, ln)
        self.table = table

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        # peek max_len bits (MSB-first within the code): VP8L writes
        # code bits most-significant-first into the LSB-first stream,
        # so peeking means reading bit-by-bit into an accumulator
        acc = 0
        got = 0
        while got < self.max_len:
            acc = (acc << 1) | br.read(1)
            got += 1
            # early exit: check if the prefix formed so far is a code
            ent = self.table.get(acc << (self.max_len - got))
            if ent is not None and ent[1] == got:
                return ent[0]
        ent = self.table.get(acc)
        if ent is None:
            raise WebpError("invalid prefix code word")
        return ent[0]


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) under the canonical assignment."""
    nz = sorted((ln, sym) for sym, ln in enumerate(lengths) if ln > 0)
    out = {}
    code = 0
    prev = nz[0][0] if nz else 0
    for ln, sym in nz:
        code <<= ln - prev
        prev = ln
        out[sym] = (code, ln)
        code += 1
    return out


def _build_lengths(freqs: dict[int, int], max_len: int = 15) -> list[int]:
    """Package-merge-free length assignment: standard Huffman tree,
    then length-limit by clamping + Kraft fixup (frequencies here are
    small images, depth rarely exceeds 15)."""
    syms = [s for s, f in freqs.items() if f > 0]
    n = (max(syms) + 1) if syms else 1
    lengths = [0] * n
    if len(syms) == 1:
        lengths[syms[0]] = 1
        return lengths
    import heapq

    heap = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freqs.items())) if f > 0]
    heapq.heapify(heap)
    tick = len(heap)
    depth = {s: 0 for s in syms}
    while len(heap) > 1:
        f1, _, g1 = heapq.heappop(heap)
        f2, _, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, tick, g1 + g2))
        tick += 1
    for s, d in depth.items():
        lengths[s] = min(d, max_len)
    # Kraft fixup after clamping
    while sum(1 << (max_len - ln) for ln in lengths if ln) > (1 << max_len):
        for s in sorted(depth, key=lambda x: lengths[x]):
            if 0 < lengths[s] < max_len:
                lengths[s] += 1
                break
    return lengths


def _write_prefix_code(bw: _BitWriter, lengths: list[int]) -> None:
    """Emit one prefix code: simple form for <=2 symbols, else the
    full code-length-coded form (no 16/17/18 repeats — correct, just
    not maximally compact)."""
    nz = [s for s, ln in enumerate(lengths) if ln > 0]
    if 1 <= len(nz) <= 2 and all(s < 256 for s in nz):
        bw.write(1, 1)  # simple
        bw.write(len(nz) - 1, 1)
        first = nz[0]
        if first <= 1:
            bw.write(0, 1)  # 1-bit first symbol
            bw.write(first, 1)
        else:
            bw.write(1, 1)
            bw.write(first, 8)
        if len(nz) == 2:
            bw.write(nz[1], 8)
        return
    bw.write(0, 1)  # full form
    used = max(nz) + 1
    # code-length alphabet: lengths of the per-symbol length symbols
    cl_freqs: dict[int, int] = {}
    for s in range(used):
        cl_freqs[lengths[s]] = cl_freqs.get(lengths[s], 0) + 1
    cl_lengths = _build_lengths(cl_freqs, max_len=7)
    while len(cl_lengths) < 19:
        cl_lengths.append(0)
    order = [17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]
    # how many of the ordered code-length code lengths must be sent
    last_needed = 0
    for i, sym in enumerate(order):
        if cl_lengths[sym] > 0:
            last_needed = i + 1
    num = max(last_needed, 4)
    bw.write(num - 4, 4)
    for sym in order[:num]:
        bw.write(cl_lengths[sym], 3)
    cl_codes = _canonical_codes(cl_lengths)
    if len(cl_codes) == 1:
        # a single-symbol prefix code consumes ZERO bits per symbol
        # (the decoder returns it without reading) — emit nothing
        only = next(iter(cl_codes))
        cl_codes[only] = (0, 0)
    # max_symbol shortcut: the encoder ALWAYS emits it, stopping the
    # decoder after `used` symbols (harmless when used == len).
    # spec: max_symbol = 2 + read(n)
    need = max(used - 2, 0)
    nbits = max(2, need.bit_length())
    nbits = nbits + (nbits & 1)  # must be 2 + 2*read(3): even, 2..16
    if nbits > 16:
        raise WebpError("alphabet too large for max_symbol field")
    bw.write(1, 1)
    bw.write((nbits - 2) // 2, 3)
    bw.write(need, nbits)
    for s in range(used):
        code, ln = cl_codes[lengths[s]]
        for i in range(ln - 1, -1, -1):  # MSB-first
            bw.write((code >> i) & 1, 1)


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        if br.read(1):
            first = br.read(8)
        else:
            first = br.read(1)
        lengths = [0] * alphabet_size
        if num_symbols == 1:
            if first >= alphabet_size:
                raise WebpError("simple-code symbol out of range")
            lengths[first] = 1
            pc = _PrefixCode(lengths)
            pc.single = first  # single symbol: zero-bit code
            return pc
        second = br.read(8)
        if first >= alphabet_size or second >= alphabet_size or first == second:
            raise WebpError("bad simple code symbols")
        lengths[first] = 1
        lengths[second] = 1
        return _PrefixCode(lengths)
    num_code_lengths = 4 + br.read(4)
    order = [17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]
    cl_lengths = [0] * 19
    for i in range(num_code_lengths):
        cl_lengths[order[i]] = br.read(3)
    cl_code = _PrefixCode(cl_lengths)
    if br.read(1):  # max_symbol present
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    sym = 0
    while sym < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_code.decode(br)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev_len = cl
        elif cl == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if sym >= alphabet_size:
                    raise WebpError("code-length repeat overflow")
                lengths[sym] = prev_len
                sym += 1
        elif cl == 17:
            sym += 3 + br.read(3)
        else:  # 18
            sym += 11 + br.read(7)
    if sym > alphabet_size:
        raise WebpError("code lengths overflow alphabet")
    return _PrefixCode(lengths)


# -------------------------------------------------------- decoding core
def _length_from_prefix(br: _BitReader, code: int) -> int:
    """LZ77 length/distance prefix decoding (spec 'prefix coding')."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _decode_pixels(
    br: _BitReader,
    w: int,
    h: int,
    groups: list[list[_PrefixCode]],
    meta: np.ndarray | None,
    meta_bits: int,
    cache_bits: int,
) -> np.ndarray:
    """Entropy-coded ARGB pixel stream -> (h*w, 4) uint8 [a, r, g, b]."""
    n = w * h
    out = np.zeros((n, 4), np.uint8)
    cache = [0] * (1 << cache_bits) if cache_bits else None
    pos = 0
    gidx = 0
    codes = groups[0]
    while pos < n:
        if meta is not None:
            y, x = divmod(pos, w)
            g = int(meta[y >> meta_bits, x >> meta_bits])
            if g != gidx or pos == 0:
                gidx = g
                codes = groups[g]
        elif pos == 0:
            codes = groups[0]
        s = codes[0].decode(br)
        if s < 256:
            r = codes[1].decode(br)
            b = codes[2].decode(br)
            a = codes[3].decode(br)
            out[pos] = (a, r, s, b)
            if cache is not None:
                argb = (a << 24) | (r << 16) | (s << 8) | b
                cache[((_CACHE_MULT * argb) & 0xFFFFFFFF) >> (32 - cache_bits)] = argb
            pos += 1
        elif s < 256 + 24:
            length = _length_from_prefix(br, s - 256)
            dcode = _length_from_prefix(br, codes[4].decode(br))
            if dcode > 120:
                dist = dcode - 120
            else:
                dx, dy = _DIST_MAP[dcode - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n:
                raise WebpError("LZ77 reference out of range")
            for i in range(length):
                out[pos + i] = out[pos + i - dist]
            if cache is not None:
                for i in range(length):
                    a, r, g, b = out[pos + i]
                    argb = (int(a) << 24) | (int(r) << 16) | (int(g) << 8) | int(b)
                    cache[((_CACHE_MULT * argb) & 0xFFFFFFFF) >> (32 - cache_bits)] = argb
            pos += length
        else:
            if cache is None:
                raise WebpError("cache symbol without color cache")
            argb = cache[s - 256 - 24]
            out[pos] = (argb >> 24 & 0xFF, argb >> 16 & 0xFF, argb >> 8 & 0xFF, argb & 0xFF)
            pos += 1
    return out


def _decode_image_stream(br: _BitReader, w: int, h: int, is_main: bool):
    """Spec DecodeImageStream: [transforms] + entropy-coded image.
    Returns (pixels (h, w, 4) argb-channel-order array, transforms)."""
    transforms = []
    xsize = w
    if is_main:
        while br.read(1):
            ttype = br.read(2)
            if any(t[0] == ttype for t in transforms):
                raise WebpError("duplicate transform")
            if ttype in (0, 1):  # predictor / cross-color: tile image
                size_bits = br.read(3) + 2
                tw = (xsize + (1 << size_bits) - 1) >> size_bits
                th = (h + (1 << size_bits) - 1) >> size_bits
                tiles, _ = _decode_image_stream(br, tw, th, False)
                transforms.append((ttype, size_bits, tiles))
            elif ttype == 2:  # subtract green
                transforms.append((2,))
            elif ttype == 3:  # color indexing
                pal_size = br.read(8) + 1
                pal_px, _ = _decode_image_stream(br, pal_size, 1, False)
                pal = pal_px.reshape(pal_size, 4).astype(np.uint8)
                # palette entries are delta-coded component-wise
                pal = np.cumsum(pal.astype(np.int64), axis=0).astype(np.uint8)
                if pal_size <= 2:
                    width_bits = 3
                elif pal_size <= 4:
                    width_bits = 2
                elif pal_size <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append((3, width_bits, pal, xsize))
                if width_bits:
                    xsize = (xsize + (1 << width_bits) - 1) >> width_bits
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise WebpError("bad color-cache size")
    meta = None
    meta_bits = 0
    n_groups = 1
    if is_main and br.read(1):  # entropy (meta prefix) image
        meta_bits = br.read(3) + 2
        mw = (xsize + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        mpx, _ = _decode_image_stream(br, mw, mh, False)
        meta = (
            mpx[:, :, 1].astype(np.int32) << 8 | mpx[:, :, 2].astype(np.int32)
        )
        n_groups = int(meta.max()) + 1
    green_size = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    sizes = [green_size, 256, 256, 256, 40]
    groups = [
        [_read_prefix_code(br, sz) for sz in sizes] for _ in range(n_groups)
    ]
    flat = _decode_pixels(br, xsize, h, groups, meta, meta_bits, cache_bits)
    px = flat.reshape(h, xsize, 4)
    return px, transforms


def _avg2(a, b):
    return (a.astype(np.int32) + b.astype(np.int32)) // 2


def _inverse_predictor(px: np.ndarray, size_bits: int, tiles: np.ndarray) -> np.ndarray:
    """Predictor transform inverse: residual + prediction, row by row
    (each pixel depends on already-reconstructed neighbours)."""
    h, w, _ = px.shape
    out = px.astype(np.int32)
    modes = tiles[:, :, 2]  # green channel of the tile image

    def clamp_add_sub_full(l, t, tl):
        return np.clip(l.astype(np.int32) + t.astype(np.int32) - tl.astype(np.int32), 0, 255)

    def clamp_add_sub_half(ave, tl):
        # spec: Clamp(a + (a - b) / 2) with C division, which
        # TRUNCATES toward zero; numpy's // floors, off by one for
        # negative deltas (d=-3: C gives -1, floor gives -2)
        d = ave.astype(np.int32) - tl.astype(np.int32)
        half = np.where(d >= 0, d // 2, -((-d) // 2))
        return np.clip(ave.astype(np.int32) + half, 0, 255)

    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0], np.int32)  # ARGB black
            elif y == 0:
                pred = out[y, x - 1]
            elif x == 0:
                pred = out[y - 1, x]
            else:
                mode = int(modes[y >> size_bits, x >> size_bits])
                L = out[y, x - 1]
                T = out[y - 1, x]
                TL = out[y - 1, x - 1]
                # rightmost column: TR wraps to the CURRENT row's
                # leftmost pixel (linear addressing pos - w + 1, the
                # libwebp border rule) — already reconstructed
                TR = out[y - 1, x + 1] if x + 1 < w else out[y, 0]
                if mode == 0:
                    pred = np.array([255, 0, 0, 0], np.int32)
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = _avg2(_avg2(L, TR), T)
                elif mode == 6:
                    pred = _avg2(L, TL)
                elif mode == 7:
                    pred = _avg2(L, T)
                elif mode == 8:
                    pred = _avg2(TL, T)
                elif mode == 9:
                    pred = _avg2(T, TR)
                elif mode == 10:
                    pred = _avg2(_avg2(L, TL), _avg2(T, TR))
                elif mode == 11:  # select
                    p = L.astype(np.int32) + T.astype(np.int32) - TL.astype(np.int32)
                    pl = int(np.abs(p - L.astype(np.int32)).sum())
                    pt = int(np.abs(p - T.astype(np.int32)).sum())
                    pred = L if pl < pt else T
                elif mode == 12:
                    pred = clamp_add_sub_full(L, T, TL)
                elif mode == 13:
                    pred = clamp_add_sub_half(_avg2(L, T), TL)
                else:
                    raise WebpError(f"bad predictor mode {mode}")
            out[y, x] = (out[y, x] + pred) & 0xFF
    return out.astype(np.uint8)


def _inverse_cross_color(px: np.ndarray, size_bits: int, tiles: np.ndarray) -> np.ndarray:
    h, w, _ = px.shape
    out = px.astype(np.int32)
    # transform elements live in the tile pixel channels:
    # green_to_red in blue, green_to_blue in green, red_to_blue in red
    g2r = tiles[:, :, 3].astype(np.int8)
    g2b = tiles[:, :, 2].astype(np.int8)
    r2b = tiles[:, :, 1].astype(np.int8)
    ty = np.arange(h) >> size_bits
    tx = np.arange(w) >> size_bits
    G2R = g2r[np.ix_(ty, tx)].astype(np.int32)
    G2B = g2b[np.ix_(ty, tx)].astype(np.int32)
    R2B = r2b[np.ix_(ty, tx)].astype(np.int32)
    g = out[:, :, 2].astype(np.int8).astype(np.int32)
    out[:, :, 1] = (out[:, :, 1] + ((G2R * g) >> 5)) & 0xFF
    r = out[:, :, 1].astype(np.int8).astype(np.int32)
    out[:, :, 3] = (out[:, :, 3] + ((G2B * g) >> 5) + ((R2B * r) >> 5)) & 0xFF
    return out.astype(np.uint8)


def _inverse_transforms(px: np.ndarray, transforms: list, out_w: int) -> np.ndarray:
    for t in reversed(transforms):
        if t[0] == 2:  # subtract green
            g = px[:, :, 2].astype(np.int32)
            px = px.astype(np.int32)
            px[:, :, 1] = (px[:, :, 1] + g) & 0xFF
            px[:, :, 3] = (px[:, :, 3] + g) & 0xFF
            px = px.astype(np.uint8)
        elif t[0] == 0:
            px = _inverse_predictor(px, t[1], t[2])
        elif t[0] == 1:
            px = _inverse_cross_color(px, t[1], t[2])
        elif t[0] == 3:
            _, width_bits, pal, orig_w = t
            h = px.shape[0]
            idx = px[:, :, 2]  # packed indices in green
            if width_bits:
                per = 1 << width_bits
                bits = 8 >> width_bits
                cols = []
                for i in range(per):
                    cols.append((idx >> (i * bits)) & ((1 << bits) - 1))
                idx = np.stack(cols, axis=2).reshape(h, -1)[:, :orig_w]
            if int(idx.max(initial=0)) >= len(pal):
                raise WebpError("palette index out of range")
            px = pal[idx]
    return px


def decode_webp(data: bytes) -> np.ndarray:
    """WebP bytes -> (H, W, 3) RGB or (H, W, 4) RGBA uint8 (alpha kept
    only when the header flags it)."""
    data = bytes(data)
    if data[:4] != RIFF_MAGIC or data[8:12] != WEBP_MAGIC:
        raise WebpError("not a WebP payload")
    pos = 12
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if tag == b"VP8L":
            payload = body
            break
        if tag == b"VP8 ":
            raise WebpError(
                "lossy WebP (VP8 intra coding) requires a codec library "
                "not installed in this container; only lossless VP8L "
                "is supported"
            )
        pos += 8 + size + (size & 1)
    if payload is None:
        raise WebpError("no VP8L chunk found")
    if not payload or payload[0] != 0x2F:
        raise WebpError("bad VP8L signature byte")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    has_alpha = br.read(1)
    if br.read(3) != 0:
        raise WebpError("unknown VP8L version")
    px, transforms = _decode_image_stream(br, w, h, True)
    px = _inverse_transforms(px, transforms, w)
    if px.shape[1] != w:
        raise WebpError("width mismatch after transforms")
    a, r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2], px[:, :, 3]
    rgb = np.stack([r, g, b], axis=2)
    if has_alpha:
        return np.concatenate([rgb, a[:, :, None]], axis=2)
    return np.ascontiguousarray(rgb)


# ------------------------------------------------------------- encoding
def _emit_symbols(bw: _BitWriter, syms, codes: dict[int, tuple[int, int]]) -> None:
    for s in syms:
        code, ln = codes[int(s)]
        for i in range(ln - 1, -1, -1):
            bw.write((code >> i) & 1, 1)


def _channel_code(bw: _BitWriter, values: np.ndarray, alphabet: int):
    """Write the prefix code for one channel; returns its canonical
    codes ({} when the channel is a zero-bit singleton)."""
    freqs: dict[int, int] = {}
    for v, c in zip(*np.unique(values, return_counts=True)):
        freqs[int(v)] = int(c)
    nz = sorted(freqs)
    if len(nz) == 1:
        # simple code, single symbol: consumes 0 bits per pixel
        sym = nz[0]
        bw.write(1, 1)
        bw.write(0, 1)
        if sym <= 1:
            bw.write(0, 1)
            bw.write(sym, 1)
        else:
            bw.write(1, 1)
            bw.write(sym, 8)
        return {}
    lengths = _build_lengths(freqs)
    while len(lengths) < alphabet:
        lengths.append(0)
    _write_prefix_code(bw, lengths[:alphabet])
    return _canonical_codes(lengths)


def _write_image_stream(
    bw: _BitWriter,
    a: np.ndarray,
    r: np.ndarray,
    g: np.ndarray,
    b: np.ndarray,
    main: bool,
) -> None:
    """Literal-only entropy-coded image stream over flat channel
    arrays: no color cache, no meta prefix image, never-used
    zero-bit distance code. Shared by encode_webp's main image and the
    test suite's hand-built transform sub-images."""
    bw.write(0, 1)  # no color cache
    if main:
        bw.write(0, 1)  # no meta prefix image
    green_codes = _channel_code(bw, g, 256 + 24)
    red_codes = _channel_code(bw, r, 256)
    blue_codes = _channel_code(bw, b, 256)
    alpha_codes = _channel_code(bw, a, 256)
    # distance code: never used (no LZ77) — single-symbol simple code
    bw.write(1, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    # pixel stream: green, red, blue, alpha per pixel (empty code dicts
    # are zero-bit singletons)
    chans = [
        (g, green_codes), (r, red_codes), (b, blue_codes), (a, alpha_codes)
    ]
    live = [(vals, codes) for vals, codes in chans if codes]
    for i in range(len(g)):
        for vals, codes in live:
            code, ln = codes[int(vals[i])]
            for j in range(ln - 1, -1, -1):
                bw.write((code >> j) & 1, 1)


def encode_webp(image: np.ndarray) -> bytes:
    """gray (H, W) / RGB (H, W, 3) / RGBA (H, W, 4) uint8 -> lossless
    WebP bytes. Deterministic (same pixels, same bytes). Uses the
    subtract-green transform + literal-only canonical prefix codes."""
    img = np.asarray(image, np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    if img.ndim != 3 or img.shape[2] not in (3, 4):
        raise WebpError("image must be gray (H,W), RGB (H,W,3) or RGBA (H,W,4)")
    h, w = img.shape[:2]
    if not (0 < w <= 1 << 14 and 0 < h <= 1 << 14):
        raise WebpError("dimensions exceed VP8L's 14-bit limit")
    has_alpha = img.shape[2] == 4
    r = img[:, :, 0].astype(np.int32)
    g = img[:, :, 1].astype(np.int32)
    b = img[:, :, 2].astype(np.int32)
    a = img[:, :, 3] if has_alpha else np.full((h, w), 255, np.uint8)
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if has_alpha else 0, 1)
    bw.write(0, 3)  # version
    # one transform: subtract green
    bw.write(1, 1)
    bw.write(2, 2)
    bw.write(0, 1)  # no more transforms
    rg = ((r - g) & 0xFF).ravel()
    bg = ((b - g) & 0xFF).ravel()
    gg = g.ravel()
    aa = np.asarray(a, np.uint8).ravel()
    _write_image_stream(bw, aa, rg, gg, bg, main=True)
    payload = b"\x2f" + bw.finish()
    vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        vp8l += b"\x00"
    riff = RIFF_MAGIC + struct.pack("<I", 4 + len(vp8l)) + WEBP_MAGIC + vp8l
    return riff
