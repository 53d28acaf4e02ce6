"""Perceptual dHash + hamming near-dup (operators/phash.py)."""

import numpy as np
import pytest

from medical_and_charity_document_extraction_system_spark.operators.multimodal import (
    attach_page_images,
    render_page_image,
)
from medical_and_charity_document_extraction_system_spark.operators.phash import (
    dhash64_np,
    dhash_near_dup,
    image_dhash,
)


def test_planted_gradients():
    # strictly decreasing brightness left->right: every left cell is
    # brighter -> all 64 bits set -> signed int64 -1
    dec = np.tile(np.arange(255, 0, -255 // 90, np.uint8)[:90], (40, 1))[:, :90]
    assert dhash64_np(dec) == -1
    # strictly increasing: no bit set
    inc = dec[:, ::-1].copy()
    assert dhash64_np(inc) == 0
    # flat image: ties are NOT greater -> 0
    flat = np.full((32, 36), 77, np.uint8)
    assert dhash64_np(flat) == 0


def test_small_perturbation_small_hamming():
    img = render_page_image(3)
    noisy = img.copy()
    noisy[:2, :2] = 255 - noisy[:2, :2]  # touch one corner cell
    d = bin((dhash64_np(img) ^ dhash64_np(noisy)) & ((1 << 64) - 1)).count("1")
    assert d <= 2
    other = render_page_image(50)
    d2 = bin((dhash64_np(img) ^ dhash64_np(other)) & ((1 << 64) - 1)).count("1")
    assert d2 > 4


def test_operator_matches_numpy_through_container(spark):
    docs = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    out = {
        r.media_id: r.dhash
        for r in image_dhash(attach_page_images(docs)).collect()
    }
    for i in range(20):
        assert out[i] == dhash64_np(render_page_image(i)), f"img {i}"


def test_near_dup_matches_brute_force(spark):
    n = 60
    hs = {i: dhash64_np(render_page_image(i)) for i in range(n)}
    want = set()
    for i in range(n):
        for j in range(i + 1, n):
            d = bin((hs[i] ^ hs[j]) & ((1 << 64) - 1)).count("1")
            if d <= 4:
                want.add((i, j, d))
    hdf = spark.createDataFrame(
        [(i, h) for i, h in hs.items()], "media_id long, dhash long"
    )
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in dhash_near_dup(hdf, max_hamming=4).collect()
    }
    assert got == want


def test_undecodable_payload_degrades(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"not an image"))], "media_id long, payload binary"
    )
    rows = image_dhash(df).collect()
    assert rows[0].dhash is None and rows[0].error


def test_rejects_bad_threshold(spark):
    df = spark.createDataFrame([(1, 0)], "media_id long, dhash long")
    with pytest.raises(ValueError):
        dhash_near_dup(df, max_hamming=5)
