"""Multimodal columns: image/audio/video as opaque ``binary`` plus
typed metadata, with decode/feature/resize/frame-sample stages as
vectorized Arrow stages.

Image decode is REAL for PNG (pure-Python codec, functions/png.py)
and netpbm; JPEG/WebP and audio codecs need libraries NOT in this
container and stay gated (clearly-marked NotImplementedError, with a
deterministic fake carrying the Spark-side plumbing — schema,
partitioning, UDF signature, Arrow batch shape). Mirrors how the
reference gates real OCR engines behind the registry while the
deterministic stub carries the tests (operators/engines.py).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not installed here
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_DIM = 16

_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic binary payloads derived from the id column —
    the test stand-in for real WARC image/audio payloads."""
    payload = F.encode(
        F.concat(F.lit("MEDIA:"), F.col(id_col).cast("string"), F.lit(":"),
                 F.md5(F.col(id_col).cast("string"))),
        "UTF-8",
    )
    kind = F.when(F.col(id_col) % 3 == 0, "image").when(
        F.col(id_col) % 3 == 1, "audio"
    ).otherwise("video")
    return df.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.create_map(F.lit("source"), F.lit("synthetic")).alias("meta"),
    )


def render_page_image(doc_id: int, height: int = 120, width: int = 240) -> np.ndarray:
    """Deterministic synthetic page: white background, black text-line
    bars, doc-dependent skew in [-3, 3]° and sprinkled noise pixels —
    the reference's create_test_image analog
    (/root/reference/scripts/test_preprocessing.py:22-49), as a pure
    function of doc_id (no RNG) so goldens are construction-time."""
    img = np.full((height, width), 255, np.uint8)
    for y0 in range(15, height - 15, 24):
        x = 15
        while x < width - 30:
            wlen = 12 + (x * 7 + y0 + doc_id) % 24
            img[y0 : y0 + 8, x : x + wlen] = 0
            x += wlen + 8
    skew = float((doc_id % 7) - 3)
    from ..functions import image_ops

    img = image_ops.rotate_image(img, skew)
    # deterministic speckle (hash pattern, not RNG)
    yy, xx = np.meshgrid(np.arange(img.shape[0]), np.arange(img.shape[1]), indexing="ij")
    mask = ((xx * 2654435761 + yy * 40503 + doc_id * 7919) % 9973) < 30
    img[mask] = np.where(img[mask] > 127, 0, 255).astype(np.uint8)
    return img


def attach_page_images(
    df: DataFrame, id_col: str = "doc_id", fan_out: bool = True,
    codec: str = "netpbm",
) -> DataFrame:
    """(id) -> (media_id, payload=binary PGM or PNG per ``codec``) via
    a mapInPandas render stage; the test/bench feeder for
    operators/preprocess.py. ``codec="png"`` feeds real PNG payloads
    through the pure-Python decoder (functions/png.py) — same pixels,
    different container, so downstream results must be identical.

    ``fan_out`` repartitions the id rows to full width first: a small
    filtered input (e.g. 200 docs from one parquet split) would
    otherwise put the whole render+preprocess chain on ONE core
    (measured 9.3s -> 0.9s on the bench). The shuffle moves only ids —
    always cheap relative to per-image work."""
    from ..functions import imageio

    if fan_out:
        df = df.select(id_col).repartition(
            df.sparkSession.sparkContext.defaultParallelism
        )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [
                        imageio.encode_as(render_page_image(int(i)), codec)
                        for i in ids
                    ],
                }
            )

    return df.select(id_col).mapInPandas(run, schema=schema)


def resize_images(
    df: DataFrame,
    height: int,
    width: int,
    id_col: str = "media_id",
    image_col: str = "payload",
) -> DataFrame:
    """Vectorized image resize stage: binary netpbm in -> nearest-
    neighbor resample (pure numpy index arithmetic — no PIL/cv2) ->
    binary netpbm out, with the output dims as real columns. The
    standard pre-embedding normalization step of a multimodal training
    pipeline; accepts netpbm or PNG and answers in kind
    (functions/imageio.py). Undecodable payloads degrade to error
    rows."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("image", T.BinaryType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("error", T.StringType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import imageio

        for pdf in batches:
            out = {k: [] for k in ("media_id", "image", "width", "height", "error")}
            for mid, payload in zip(pdf[id_col], pdf[image_col]):
                out["media_id"].append(int(mid))
                try:
                    img, fmt = imageio.decode_auto(bytes(payload))
                    # nearest-neighbor grid (floor((i+0.5)*src/dst))
                    ys = ((np.arange(height) + 0.5) * img.shape[0] / height).astype(int)
                    xs = ((np.arange(width) + 0.5) * img.shape[1] / width).astype(int)
                    resized = img[np.clip(ys, 0, img.shape[0] - 1)][
                        :, np.clip(xs, 0, img.shape[1] - 1)
                    ]
                    out["image"].append(imageio.encode_as(resized, fmt))
                    out["height"].append(height)
                    out["width"].append(width)
                    out["error"].append(None)
                except Exception as exc:
                    out["image"].append(None)
                    out["height"].append(None)
                    out["width"].append(None)
                    out["error"].append(str(exc)[:200])
            yield pd.DataFrame(out)

    return df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(image_col)
    ).mapInPandas(run, schema=schema)


FRAME_MAGIC = b"FRAMES\n"


def encode_frames(frames: list[np.ndarray]) -> bytes:
    """Deterministic multi-frame container: ``FRAMES\\n`` + length-
    prefixed netpbm frames — the test stand-in for a real video codec
    (the Spark-side plumbing is what is under test; a real deployment
    swaps this for ffmpeg-in-a-UDF)."""
    from ..functions import netpbm

    parts = [FRAME_MAGIC]
    for fr in frames:
        data = netpbm.encode(fr)
        parts.append(len(data).to_bytes(8, "big"))
        parts.append(data)
    return b"".join(parts)


def decode_frames(payload: bytes) -> list["np.ndarray"]:
    from ..functions import netpbm

    if not payload.startswith(FRAME_MAGIC):
        raise ValueError("not a FRAMES container")
    out = []
    pos = len(FRAME_MAGIC)
    while pos < len(payload):
        n = int.from_bytes(payload[pos : pos + 8], "big")
        pos += 8
        out.append(netpbm.decode(bytes(payload[pos : pos + n])))
        pos += n
    return out


def attach_fake_video(
    df: DataFrame, id_col: str = "doc_id", fan_out: bool = True,
    codec: str = "frames",
) -> DataFrame:
    """(id) -> (media_id, payload): 1 + id%5 frames of deterministic
    synthetic pages — pure function of the id. ``codec="frames"`` is
    the length-prefixed test container; ``codec="gif"`` encodes the
    SAME frames as a real animated GIF89a (functions/gif.py), so the
    sampler exercises a genuine multi-frame format. fan_out as in
    attach_page_images."""
    if codec not in ("frames", "gif"):
        raise ValueError(f"unknown video codec {codec!r}")
    if fan_out:
        df = df.select(id_col).repartition(
            df.sparkSession.sparkContext.defaultParallelism
        )
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("n_frames", T.IntegerType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import gif

        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads, counts = [], []
            for i in ids:
                n = 1 + int(i) % 5
                frames = [
                    render_page_image(int(i) * 31 + f, height=24, width=32)
                    for f in range(n)
                ]
                if codec == "gif":
                    rgb = [np.stack([fr] * 3, axis=2) for fr in frames]
                    payloads.append(gif.encode_gif(rgb))
                else:
                    payloads.append(encode_frames(frames))
                counts.append(n)
            yield pd.DataFrame(
                {"media_id": ids, "payload": payloads, "n_frames": counts}
            )

    return df.select(id_col).mapInPandas(run, schema=schema)


def sample_frames(
    df: DataFrame,
    every_k: int = 2,
    id_col: str = "media_id",
    video_col: str = "payload",
) -> DataFrame:
    """Frame sampling (flatMap: one row per KEPT frame — every k-th,
    0-indexed): video binary -> (media_id, frame_index, frame,
    n_frames_total). The decimation step before per-frame feature
    extraction; more output rows than input rows, zero shuffle."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_index", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), True),
            T.StructField("n_frames_total", T.IntegerType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import gif, netpbm

        for pdf in batches:
            mids, idxs, frames, totals = [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[video_col]):
                raw = bytes(payload)
                try:
                    if raw[:4] == b"GIF8":  # real animated container
                        frs = gif.decode_gif(raw)
                        enc = lambda fr: gif.encode_gif([fr])  # noqa: E731
                    else:
                        frs = decode_frames(raw)
                        enc = netpbm.encode
                except ValueError:
                    continue
                for j in range(0, len(frs), every_k):
                    mids.append(int(mid))
                    idxs.append(j)
                    frames.append(enc(frs[j]))
                    totals.append(len(frs))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(mids, dtype="int64"),
                    "frame_index": pd.Series(idxs, dtype="int32"),
                    "frame": frames,
                    "n_frames_total": pd.Series(totals, dtype="int32"),
                }
            )

    return df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(video_col)
    ).mapInPandas(run, schema=schema)


def synth_audio(media_id: int, rate: int = 8000) -> np.ndarray:
    """Deterministic square-wave clip, pure function of the id (no
    RNG): n = 800 + id%50 samples, amplitude 1000 + id%500, half
    period 2 + id%7 — chosen so every audio feature is exact integer
    arithmetic the oracle recomputes (RMS of a square wave IS its
    amplitude; crossings = (n-1) // halfperiod)."""
    n = 800 + media_id % 50
    p = 2 + media_id % 7
    a = 1000 + media_id % 500
    return np.where((np.arange(n) // p) % 2 == 0, a, -a).astype(np.int16)


def attach_fake_audio(
    df: DataFrame, id_col: str = "doc_id", fan_out: bool = True, rate: int = 8000
) -> DataFrame:
    """(id) -> (media_id, payload = REAL WAV bytes) — the audio
    analog of attach_page_images; payloads decode with any WAV
    reader, not just ours."""
    from ..functions import wavpcm

    if fan_out:
        df = df.select(id_col).repartition(
            df.sparkSession.sparkContext.defaultParallelism
        )
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [
                        wavpcm.encode_wav(synth_audio(int(i), rate), rate)
                        for i in ids
                    ],
                }
            )

    return df.select(id_col).mapInPandas(run, schema=schema)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.DoubleType(), True),
        T.StructField("peak", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("zero_crossings", T.IntegerType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def extract_audio_features(
    df: DataFrame, id_col: str = "media_id", audio_col: str = "payload"
) -> DataFrame:
    """Real audio decode + per-clip features (duration, peak, RMS,
    zero crossings) as one Arrow stage — zero shuffle; undecodable
    payloads degrade to error rows."""
    from ..functions import wavpcm

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("media_id", "n_samples", "sample_rate", "duration_ms",
                "peak", "rms", "zero_crossings", "error")
        for pdf in batches:
            out = {k: [] for k in cols}
            for mid, payload in zip(pdf[id_col], pdf[audio_col]):
                out["media_id"].append(int(mid))
                try:
                    samples, rate = wavpcm.decode_wav(bytes(payload))
                    f = wavpcm.audio_features(samples, rate)
                    for k in cols[1:-1]:
                        out[k].append(f[k])
                    out["error"].append(None)
                except Exception as exc:
                    for k in cols[1:-1]:
                        out[k].append(None)
                    out["error"].append(str(exc)[:200])
            yield pd.DataFrame(out)

    return df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(audio_col)
    ).mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


def decode_image(payload: bytes) -> "np.ndarray":
    """Decode a binary image payload: PNG, baseline JPEG, GIF, BMP,
    uncompressed TIFF and lossless WebP (VP8L) via the pure-Python
    codecs in functions/, netpbm via functions/netpbm.py — every
    suffix the reference accepts (file_utils.py:271-273). The
    remaining gated shapes (progressive JPEG, lossy-VP8 WebP,
    compressed TIFF) fall back to PIL when installed, else raise the
    documented gate."""
    from ..functions import imageio

    payload = bytes(payload)
    if imageio.sniff_format(payload) is not None:
        try:
            return imageio.decode_auto(payload)[0]
        except ValueError:
            # a recognized container our codec can't finish (e.g.
            # progressive JPEG, exotic PNG): symmetric PIL fallback
            # for every format, typed error without PIL
            if not _HAS_PIL:
                raise
    if _HAS_PIL:  # pragma: no cover - PIL absent in this container
        import io

        return np.asarray(Image.open(io.BytesIO(payload)))
    raise NotImplementedError(
        "unrecognized image container (or a gated shape: progressive "
        "JPEG, lossy-VP8 WebP, compressed TIFF) — requires PIL/cv2, "
        "not installed in this container"
    )


def deterministic_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic fake feature vector: blake2b hash chunks -> floats
    in [0, 1). Stands in for a real embedding model; same signature and
    batch shape."""
    h = hashlib.blake2b(payload, digest_size=dim * 4).digest()
    ints = np.frombuffer(h, dtype=np.uint32)
    return (ints.astype(np.float64) / 2**32).astype(np.float32).tolist()


def extract_media_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature-extraction stage over MEDIA_SCHEMA rows.
    The Arrow plumbing (iterator form, per-batch numpy work, binary
    columns) is exactly what a real decoder stage uses."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "features": [
                        deterministic_features(bytes(p)) if p is not None else None
                        for p in pdf["payload"]
                    ],
                }
            )

    return df.mapInPandas(run, schema=_FEATURES_SCHEMA)
