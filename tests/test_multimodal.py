import pytest

from medical_and_charity_document_extraction_system_spark.operators.multimodal import (
    attach_fake_media,
    decode_image,
    deterministic_features,
    extract_media_features,
    FEATURE_DIM,
)

from .conftest import SF_SMALL


def test_decode_is_clearly_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG fake")


def test_feature_plumbing_end_to_end(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(50)
    media = attach_fake_media(docs)
    feats = extract_media_features(media).collect()
    assert len(feats) == 50
    for r in feats:
        assert len(r.features) == FEATURE_DIM
        assert all(0.0 <= x < 1.0 for x in r.features)
        assert r.n_bytes > 0
        assert r.kind in ("image", "audio", "video")


def test_features_deterministic():
    a = deterministic_features(b"payload-123")
    b = deterministic_features(b"payload-123")
    c = deterministic_features(b"payload-124")
    assert a == b != c


def test_resize_pixels_match_numpy_oracle(spark):
    """Distributed resize output equals the same nearest-neighbor
    resample computed locally — pixel-exact."""
    import numpy as np

    from medical_and_charity_document_extraction_system_spark.functions import netpbm
    from medical_and_charity_document_extraction_system_spark.operators.multimodal import (
        attach_page_images,
        render_page_image,
        resize_images,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(20)
    out = {r.media_id: r for r in resize_images(
        attach_page_images(docs), height=40, width=60
    ).collect()}
    assert len(out) == 20
    for mid, r in out.items():
        assert r.error is None and (r.height, r.width) == (40, 60)
        img = render_page_image(int(mid))
        ys = ((np.arange(40) + 0.5) * img.shape[0] / 40).astype(int)
        xs = ((np.arange(60) + 0.5) * img.shape[1] / 60).astype(int)
        exp = img[np.clip(ys, 0, img.shape[0] - 1)][:, np.clip(xs, 0, img.shape[1] - 1)]
        assert np.array_equal(netpbm.decode(bytes(r.image)), exp)


def test_resize_degrades_on_bad_payload(spark):
    from medical_and_charity_document_extraction_system_spark.operators.multimodal import (
        resize_images,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"not an image"))], "media_id long, payload binary"
    )
    r = resize_images(df, height=8, width=8).collect()[0]
    assert r.image is None and r.error is not None


def test_frames_roundtrip_and_sampling(spark):
    import numpy as np

    from medical_and_charity_document_extraction_system_spark.functions import netpbm
    from medical_and_charity_document_extraction_system_spark.operators.multimodal import (
        attach_fake_video,
        decode_frames,
        encode_frames,
        render_page_image,
        sample_frames,
    )

    frames = [render_page_image(i, height=16, width=20) for i in range(5)]
    rt = decode_frames(encode_frames(frames))
    assert len(rt) == 5 and all(np.array_equal(a, b) for a, b in zip(frames, rt))

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(30)
    vids = attach_fake_video(docs)
    sampled = sample_frames(vids, every_k=2).collect()
    by_media = {}
    for r in sampled:
        by_media.setdefault(r.media_id, []).append(r)
    for mid, rows in by_media.items():
        n = 1 + mid % 5
        assert sorted(r.frame_index for r in rows) == list(range(0, n, 2))
        assert all(r.n_frames_total == n for r in rows)
        # kept frame content matches the deterministic renderer
        r0 = next(r for r in rows if r.frame_index == 0)
        exp = render_page_image(int(mid) * 31, height=24, width=32)
        assert np.array_equal(netpbm.decode(bytes(r0.frame)), exp)


def test_png_fed_preprocess_matches_netpbm_fed(spark):
    """Same pixels in a PNG container must produce byte-identical
    preprocessing results (dims, skew, steps) and pixel-identical
    output images — and the output container follows the input."""
    from medical_and_charity_document_extraction_system_spark.functions import imageio
    from medical_and_charity_document_extraction_system_spark.operators.multimodal import (
        attach_page_images,
    )
    from medical_and_charity_document_extraction_system_spark.operators.preprocess import (
        preprocess_images,
    )

    docs = spark.range(12).withColumnRenamed("id", "doc_id")
    out_pgm = {
        r.media_id: r
        for r in preprocess_images(attach_page_images(docs)).collect()
    }
    out_png = {
        r.media_id: r
        for r in preprocess_images(attach_page_images(docs, codec="png")).collect()
    }
    assert set(out_pgm) == set(out_png) == set(range(12))
    for mid in out_pgm:
        a, b = out_pgm[mid], out_png[mid]
        assert (a.width, a.height, a.skew_angle, a.error) == (
            b.width, b.height, b.skew_angle, b.error,
        )
        img_a, fmt_a = imageio.decode_auto(bytes(a.image))
        img_b, fmt_b = imageio.decode_auto(bytes(b.image))
        assert fmt_a == "netpbm" and fmt_b == "png"
        assert (img_a == img_b).all()


def test_resize_accepts_png_and_answers_png(spark):
    from medical_and_charity_document_extraction_system_spark.functions import imageio
    from medical_and_charity_document_extraction_system_spark.operators.multimodal import (
        attach_page_images,
        resize_images,
    )

    docs = spark.range(4).withColumnRenamed("id", "doc_id")
    out = resize_images(
        attach_page_images(docs, codec="png"), height=32, width=48
    ).collect()
    assert all(r.error is None for r in out)
    for r in out:
        img, fmt = imageio.decode_auto(bytes(r.image))
        assert fmt == "png" and img.shape == (32, 48)


def test_decode_image_handles_png_netpbm_jpeg_and_gates_rest():
    import numpy as np
    import pytest as _pytest

    from medical_and_charity_document_extraction_system_spark.functions import jpeg, netpbm, png
    from medical_and_charity_document_extraction_system_spark.operators.multimodal import (
        decode_image,
    )

    arr = (np.arange(48, dtype=np.uint8).reshape(6, 8) * 5) % 256
    assert (decode_image(png.encode_png(arr)) == arr).all()
    assert (decode_image(netpbm.encode(arr)) == arr).all()
    out = decode_image(jpeg.encode_jpeg(arr, quality=95))
    assert out.shape == arr.shape  # lossy but real decode
    with _pytest.raises(jpeg.JpegError):
        decode_image(b"\xff\xd8\xff\xe0fakejpeg")  # damaged JPEG
    from medical_and_charity_document_extraction_system_spark.functions import webp as _webp

    with _pytest.raises(_webp.WebpError):
        decode_image(b"RIFF....WEBP")  # recognized container, no VP8L chunk
    assert (decode_image(_webp.encode_webp(arr))[:, :, 0] == arr).all()
    with _pytest.raises(NotImplementedError, match="PIL"):
        decode_image(b"II\x00\x00 not any container")  # truly unknown


def test_wav_roundtrip_and_foreign_shapes():
    import struct

    import numpy as np
    import pytest as _pytest

    from medical_and_charity_document_extraction_system_spark.functions.wavpcm import (
        WavError, audio_features, decode_wav, encode_wav,
    )

    rng = np.random.RandomState(1)
    mono = rng.randint(-30000, 30000, 500).astype(np.int16)
    stereo = rng.randint(-30000, 30000, (400, 2)).astype(np.int16)
    s, r = decode_wav(encode_wav(mono, 16000))
    assert r == 16000 and (s == mono).all()
    s2, _ = decode_wav(encode_wav(stereo, 44100))
    assert s2.shape == (400, 2) and (s2 == stereo).all()
    assert encode_wav(mono) == encode_wav(mono)  # deterministic

    # 8-bit PCM and unknown-chunk skipping (foreign writer shapes)
    data8 = bytes(range(64))
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    junk = b"LIST" + struct.pack("<I", 5) + b"xxxxx\x00"  # odd size, padded
    body = (b"WAVE" + junk + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data8)) + data8)
    wav8 = b"RIFF" + struct.pack("<I", len(body)) + body
    s8, r8 = decode_wav(wav8)
    assert r8 == 8000 and s8[0] == (0 - 128) * 256 and s8[-1] == (63 - 128) * 256

    with _pytest.raises(WavError):
        decode_wav(b"RIFFxxxxNOPE")
    # compressed format rejected
    badfmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)  # mu-law
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(badfmt)) + badfmt
            + b"data" + struct.pack("<I", 2) + b"ab")
    with _pytest.raises(WavError, match="PCM"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)

    f = audio_features(mono, 16000)
    assert f["n_samples"] == 500 and f["peak"] == int(np.abs(mono).max())


def test_audio_features_catalog_semantics(spark):
    from medical_and_charity_document_extraction_system_spark.operators.multimodal import (
        attach_fake_audio, extract_audio_features, synth_audio,
    )

    docs = spark.range(20).withColumnRenamed("id", "doc_id")
    out = {r.media_id: r for r in
           extract_audio_features(attach_fake_audio(docs)).collect()}
    assert set(out) == set(range(20))
    for i in range(20):
        n, p, a = 800 + i % 50, 2 + i % 7, 1000 + i % 500
        r = out[i]
        assert r.error is None
        assert r.n_samples == n and r.peak == a
        assert r.rms == float(a)                       # square wave: exact
        assert r.zero_crossings == (n - 1) // p
        assert r.duration_ms == n * 1000 / 8000
        assert (synth_audio(i) == synth_audio(i)).all()
