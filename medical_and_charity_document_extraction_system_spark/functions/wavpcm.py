"""Minimal RIFF/WAVE PCM codec — stdlib struct + numpy, no audio libs.

Completes the multimodal container set (netpbm/PNG/JPEG for images,
FRAMES for video): audio payloads travel as real WAV bytes and the
feature stage decodes them natively instead of hashing opaque blobs.
Public-spec code only (RIFF/WAVE, multimedia programming interface
spec 1.0).

Coverage: PCM (format 1) 8-bit unsigned and 16-bit signed
little-endian, any channel count and sample rate; unknown RIFF chunks
(LIST, fact, ...) are skipped by their declared size as the spec
requires. Compressed formats (mu-law, ADPCM, MP3-in-WAV) raise
``WavError`` so callers degrade to the error row.

Determinism: ``encode_wav`` writes a canonical header (no metadata
chunks) — same samples, same bytes.
"""

from __future__ import annotations

import struct

import numpy as np


class WavError(ValueError):
    pass


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 ndarray (n,) mono or (n, ch) -> canonical WAV bytes."""
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2 or arr.shape[1] < 1:
        raise WavError(f"unsupported sample shape {samples.shape}")
    n, ch = arr.shape
    data = arr.astype("<i2").tobytes()
    block_align = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_wav_impl(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (int16 samples (n,) mono or (n, ch), sample_rate).
    8-bit PCM is rescaled to int16 ((x - 128) * 256, the exact
    inverse-free widening every decoder uses)."""
    data = bytes(data)
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise WavError("truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise WavError("missing fmt or data chunk")
    audio_format, ch, rate, _, _, bits = fmt
    if audio_format != 1:
        raise WavError(f"unsupported audio format {audio_format} (PCM only)")
    if bits == 16:
        arr = np.frombuffer(raw[: len(raw) - (len(raw) % (2 * ch))], dtype="<i2")
        arr = arr.astype(np.int16)
    elif bits == 8:
        arr = np.frombuffer(raw[: len(raw) - (len(raw) % ch)], dtype=np.uint8)
        arr = ((arr.astype(np.int16) - 128) * 256).astype(np.int16)
    else:
        raise WavError(f"unsupported bit depth {bits}")
    if ch > 1:
        arr = arr[: (len(arr) // ch) * ch].reshape(-1, ch)
    return arr, int(rate)


def audio_features(samples: np.ndarray, rate: int) -> dict:
    """Deterministic per-clip features: sample count, duration,
    integer peak, RMS (double), zero-crossing count. Multi-channel is
    measured on channel 0 (the reference convention for mono
    analysis)."""
    x = samples[:, 0] if samples.ndim == 2 else samples
    n = int(x.shape[0])
    if n == 0:
        return {
            "n_samples": 0, "sample_rate": rate, "duration_ms": 0.0,
            "peak": 0, "rms": 0.0, "zero_crossings": 0,
        }
    xi = x.astype(np.int64)
    sq = xi * xi
    rms = float(np.sqrt(np.float64(sq.sum()) / n))
    signs = xi >= 0
    return {
        "n_samples": n,
        "sample_rate": int(rate),
        "duration_ms": float(n * 1000) / rate,
        "peak": int(np.abs(xi).max()),
        "rms": rms,
        "zero_crossings": int((signs[1:] != signs[:-1]).sum()),
    }


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """See ``_decode_wav_impl``. Malformed input of ANY shape raises
    WavError: low-level struct/index/zlib failures from truncated or
    spliced payloads are re-raised typed, so callers' degrade paths
    (except WavError/ValueError) always catch them."""
    try:
        return _decode_wav_impl(data)
    except (struct.error, IndexError) as exc:
        raise WavError(f"malformed payload: {exc}") from None
