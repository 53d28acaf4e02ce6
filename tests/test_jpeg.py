"""Pure-Python baseline JPEG codec tests (functions/jpeg.py)."""

import numpy as np
import pytest

from medical_and_charity_document_extraction_system_spark.functions.jpeg import (
    JpegError,
    decode_jpeg,
    encode_jpeg,
)


def _smooth(h=40, w=56):
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return (128 + 60 * np.sin(yy / 8.0) + 50 * np.cos(xx / 9.0)).clip(0, 255).astype(
        np.uint8
    )


def test_gray_roundtrip_quality_bounds():
    img = _smooth()
    for q, bound in ((95, 4), (75, 8)):
        out = decode_jpeg(encode_jpeg(img, quality=q))
        assert out.shape == img.shape and out.dtype == np.uint8
        assert np.abs(out.astype(int) - img.astype(int)).max() <= bound


def test_rgb_444_422_420_roundtrip():
    g = _smooth()
    rgb = np.stack([g, 255 - g, np.roll(g, 7, axis=1)], axis=2)
    out444 = decode_jpeg(encode_jpeg(rgb, quality=92, subsampling="444"))
    out422 = decode_jpeg(encode_jpeg(rgb, quality=92, subsampling="422"))
    out420 = decode_jpeg(encode_jpeg(rgb, quality=92, subsampling="420"))
    assert out444.shape == out422.shape == out420.shape == rgb.shape
    assert np.abs(out444.astype(int) - rgb.astype(int)).mean() < 3
    assert np.abs(out422.astype(int) - rgb.astype(int)).mean() < 5
    assert np.abs(out420.astype(int) - rgb.astype(int)).mean() < 6


def test_restart_markers_roundtrip():
    img = _smooth()
    data = encode_jpeg(img, quality=90, restart_interval=3)
    assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))
    out = decode_jpeg(data)
    baseline = decode_jpeg(encode_jpeg(img, quality=90))
    assert (out == baseline).all()  # RST changes framing, not pixels


def test_non_multiple_of_8_and_tiny_dims():
    for shape in ((1, 1), (7, 9), (8, 17), (23, 8)):
        img = (np.arange(np.prod(shape)).reshape(shape) * 7 % 256).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=98))
        assert out.shape == shape


def test_flat_image_near_exact():
    img = np.full((16, 24), 137, np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert np.abs(out.astype(int) - 137).max() <= 1


def test_deterministic_encode():
    g = _smooth()
    rgb = np.stack([g, g, g], axis=2)
    assert encode_jpeg(rgb, 85, "420", 4) == encode_jpeg(rgb, 85, "420", 4)
    assert decode_jpeg(encode_jpeg(g)) is not None
    a = decode_jpeg(encode_jpeg(g))
    b = decode_jpeg(encode_jpeg(g))
    assert (a == b).all()  # decoder determinism, rerun-identity


def test_progressive_rejected():
    img = _smooth()
    data = bytearray(encode_jpeg(img))
    i = data.index(b"\xff\xc0")
    data[i + 1] = 0xC2  # claim progressive
    with pytest.raises(JpegError, match="baseline"):
        decode_jpeg(bytes(data))


def test_garbage_rejected():
    with pytest.raises(JpegError):
        decode_jpeg(b"not a jpeg")
    with pytest.raises(JpegError):
        decode_jpeg(b"\xff\xd8\xff\xe0\x00\x04zz")  # truncated, no SOS


def test_imageio_roundtrips_jpeg_format():
    from medical_and_charity_document_extraction_system_spark.functions import imageio

    img = _smooth()
    payload = encode_jpeg(img, quality=90)
    arr, fmt = imageio.decode_auto(payload)
    assert fmt == "jpeg" and arr.shape == img.shape
    again = imageio.encode_as(arr, fmt)
    assert imageio.sniff_format(again) == "jpeg"
