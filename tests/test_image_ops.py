"""Image operator tests — the Spark-repo analog of the reference's
scripts/test_preprocessing.py (create_test_image at :22-49 builds
synthetic text images with controlled noise/skew, then exercises every
E/D/K/B method; :137-158 checks the detected angle against the
injected 8.0°). Same strategy here with numpy-drawn text-bar images,
plus hard assertions the reference's smoke scripts never made."""

import numpy as np
import pytest

from medical_and_charity_document_extraction_system_spark.functions import image_ops as I
from medical_and_charity_document_extraction_system_spark.functions import netpbm

RNG = np.random.default_rng(42)


def text_image(h=240, w=480):
    """White page with black text-line bars (create_test_image analog)."""
    img = np.full((h, w), 255, np.uint8)
    for y0 in range(30, h - 30, 30):
        x = 30
        while x < w - 60:
            wlen = 20 + (x * 7 + y0) % 40
            img[y0 : y0 + 12, x : x + wlen] = 0
            x += wlen + 12
    return img


@pytest.fixture(scope="module")
def page():
    return text_image()


@pytest.fixture(scope="module")
def skewed(page):
    return I.rotate_image(page, 8.0)


# ------------------------------------------------------------- netpbm
def test_netpbm_roundtrip_gray(page):
    assert np.array_equal(netpbm.decode(netpbm.encode(page)), page)


def test_netpbm_roundtrip_color(page):
    color = np.stack([page] * 3, axis=-1)
    color[..., 0] //= 2
    assert np.array_equal(netpbm.decode(netpbm.encode(color)), color)


def test_netpbm_rejects_garbage():
    with pytest.raises(ValueError):
        netpbm.decode(b"\x89PNG\r\n")


# ---------------------------------------------------------- E enhance
def test_gamma_direction():
    grad = np.tile(np.arange(256, dtype=np.uint8), (8, 1))
    assert I.gamma_correction(grad, 1.5).mean() > grad.mean()  # brighten
    assert I.gamma_correction(grad, 0.7).mean() < grad.mean()  # darken
    assert np.array_equal(I.gamma_correction(grad, 1.0), grad)


def test_brightness_contrast_linear():
    flat = np.full((10, 10), 100, np.uint8)
    assert (I.adjust_brightness_contrast(flat, brightness=20) == 120).all()
    assert (I.adjust_brightness_contrast(flat, contrast=2.0) == 72).all()


def test_sharpen_preserves_uniform_and_amplifies_edges(page):
    flat = np.full((32, 32), 128, np.uint8)
    assert np.array_equal(I.sharpen(flat), flat)
    edge_in = np.abs(np.diff(page.astype(int), axis=1)).sum()
    edge_out = np.abs(np.diff(I.sharpen(page).astype(int), axis=1)).sum()
    assert edge_out >= edge_in


def _texture(lo=100, span=40):
    base = np.random.default_rng(7).normal(0, 1, (64, 64))
    t = I._gaussian_blur_f(base, 9, 2.0)
    t = (t - t.min()) / (t.max() - t.min()) * span + lo
    return np.kron(t.astype(np.uint8), np.ones((2, 2), np.uint8))


def test_histogram_equalization_spreads_contrast():
    lc = _texture()
    assert I.histogram_equalization(lc).std() > lc.std() * 2


def test_clahe_raises_local_contrast_boundedly():
    lc = _texture()
    out = I.apply_clahe(lc, clip_limit=3.0)
    assert out.shape == lc.shape and out.dtype == np.uint8
    assert out.std() > lc.std() * 1.5
    # clip limit keeps it short of full global equalization
    assert out.std() < I.histogram_equalization(lc).std()


def test_clahe_color_shape(page):
    color = np.stack([page] * 3, axis=-1)
    assert I.apply_clahe(color).shape == color.shape


def test_enhance_dispatcher(page):
    for m in ("auto", "clahe", "histogram", "sharpen", "gamma"):
        out = I.enhance(page, m)
        assert out.shape == page.shape and out.dtype == np.uint8
    with pytest.raises(ValueError):
        I.enhance(page, "nope")


def test_enhance_for_text(page):
    assert I.enhance_for_text(np.stack([page] * 3, -1)).ndim == 2


# ---------------------------------------------------------- D denoise
def test_noise_estimator_monotone(page):
    sp = page.copy()
    sp[RNG.random(page.shape) < 0.02] = 0
    sp[RNG.random(page.shape) < 0.02] = 255
    gauss = np.clip(
        page.astype(np.float64) + RNG.normal(0, 10, page.shape), 0, 255
    ).astype(np.uint8)
    clean = I.estimate_noise(page)
    assert clean < I.estimate_noise(gauss) < I.estimate_noise(sp)
    assert clean < 8.0  # auto path: clean pages take the mild branch


def test_median_removes_salt_pepper(page):
    sp = page.copy()
    sp[RNG.random(page.shape) < 0.02] = 0
    sp[RNG.random(page.shape) < 0.02] = 255
    before = int((sp != page).sum())
    after = int((I.remove_salt_pepper(sp, 5) != page).sum())
    assert after < before * 0.5


def test_denoise_methods_run(page):
    small = page[:64, :64]
    for m in ("auto", "gaussian", "median", "bilateral", "morphology", "nlm"):
        out = I.denoise(small, m)
        assert out.shape == small.shape and out.dtype == np.uint8
    with pytest.raises(ValueError):
        I.denoise(small, "nope")


def test_adaptive_denoise_blockwise(page):
    out = I.adaptive_denoise(page[:128, :128], block=64)
    assert out.shape == (128, 128)


def test_gaussian_denoise_smooths():
    noisy = np.clip(
        np.full((64, 64), 128.0) + RNG.normal(0, 20, (64, 64)), 0, 255
    ).astype(np.uint8)
    assert I.gaussian_denoise(noisy).std() < noisy.std()


# ----------------------------------------------------------- K deskew
def test_hough_detects_injected_skew(skewed, page):
    assert abs(I.detect_skew_hough(page)) < 0.5
    assert abs(I.detect_skew_hough(skewed) - 8.0) < 1.5


def test_projection_detects_injected_skew(skewed):
    assert abs(I.detect_skew_projection(skewed) - 8.0) < 1.0


def test_contour_detects_skew_of_rotated_block():
    rect = np.full((200, 300), 255, np.uint8)
    rect[80:120, 50:250] = 0
    assert abs(I.detect_skew_contour(I.rotate_image(rect, 8.0)) - 8.0) < 3.0


def test_auto_deskew_corrects(skewed):
    corrected, angle = I.deskew(skewed, "auto")
    assert abs(angle - 8.0) < 1.5
    assert abs(I.detect_skew_projection(corrected)) < 1.5


def test_rotate_identity_shortcut(page):
    # |angle| < 0.1 degrees -> exact copy (deskewer.py:196-198 parity)
    assert np.array_equal(I.rotate_image(page, 0.05), page)


def test_rotate_expands_canvas(page):
    out = I.rotate_image(page, 45.0)
    assert out.shape[0] > page.shape[0] and out.shape[1] > page.shape[1]


def test_check_if_skewed(page, skewed):
    assert I.check_if_skewed(skewed, threshold=2.0)
    assert not I.check_if_skewed(page, threshold=2.0)


def test_deskew_dispatcher(page):
    for m in ("auto", "hough", "projection", "contour"):
        out, angle = I.deskew(page, m)
        assert out.dtype == np.uint8 and isinstance(angle, float)
    with pytest.raises(ValueError):
        I.deskew(page, "nope")


# -------------------------------------------------------- B binarize
@pytest.mark.parametrize(
    "method", ["auto", "otsu", "adaptive", "sauvola", "niblack", "triangle"]
)
def test_binarize_two_valued(page, method):
    out = I.binarize(page, method)
    assert set(np.unique(out)).issubset({0, 255})
    assert out.shape == page.shape


def test_binarize_recovers_text_mask(page):
    # ink stays ink, paper stays paper for a clean high-contrast page
    for method in ("otsu", "sauvola"):
        assert (I.binarize(page, method) == page).mean() > 0.98, method
    # local-mean thresholding hollows out ink regions wider than its
    # block (inherent to the method) — hold it to a looser bound
    assert (I.binarize(page, "adaptive") == page).mean() > 0.9


def test_binarize_unknown_method(page):
    with pytest.raises(ValueError):
        I.binarize(page, "nope")


def test_multi_scale_binarize(page):
    out = I.multi_scale_binarize(page)
    assert set(np.unique(out)).issubset({0, 255})


def test_clean_binary_removes_small_blobs(page):
    b = I.otsu_binarize(page)
    speckled = b.copy()
    speckled[5:7, 5:7] = 0  # 4-px speck
    cleaned = I.clean_binary_image(speckled, min_area=20)
    assert (cleaned[5:7, 5:7] == 255).all()
    assert np.array_equal(cleaned, b)  # real text strokes survive


def test_binarize_grayscales_color_first(page):
    color = np.stack([page] * 3, axis=-1)
    assert I.binarize(color, "otsu").ndim == 2


# ------------------------------------------- X4/X5 composed pipeline
def test_preprocess_image_array_full_chain(skewed):
    out, meta = I.preprocess_image_array(skewed)
    assert meta["steps_applied"] == ["enhance", "denoise", "deskew", "binarize"]
    assert abs(meta["skew_angle"] - 8.0) < 1.5
    assert set(np.unique(out)).issubset({0, 255})


def test_preprocess_unknown_type_falls_back(page):
    # unknown document types use the "general" preset
    # (preprocessing_service.py:135-153 parity)
    a, ma = I.preprocess_image_array(page, document_type="general")
    b, mb = I.preprocess_image_array(page, document_type="???")
    assert np.array_equal(a, b) and ma == mb


def test_preprocess_deterministic(skewed):
    a, _ = I.preprocess_image_array(skewed)
    b, _ = I.preprocess_image_array(skewed)
    assert np.array_equal(a, b)


def test_label_components_pathological_shapes():
    """Run-length union-find handles any topology in O(HW) — the
    serpentine snake that defeats naive min-propagation, diagonal-only
    chains (8-connectivity), and disjoint blobs."""
    from medical_and_charity_document_extraction_system_spark.functions.image_ops import (
        _label_components,
    )

    h, w = 60, 80
    snake = np.zeros((h, w), bool)
    for r in range(0, h, 2):
        snake[r, :] = True
        if (r // 2) % 2 == 0 and r + 1 < h:
            snake[r + 1, w - 1] = True
        elif r + 1 < h:
            snake[r + 1, 0] = True
    assert len(np.unique(_label_components(snake)[snake])) == 1

    diag = np.zeros((10, 10), bool)
    np.fill_diagonal(diag, True)
    assert len(np.unique(_label_components(diag)[diag])) == 1

    two = np.zeros((10, 10), bool)
    two[1:3, 1:3] = True
    two[6:9, 6:9] = True
    assert len(np.unique(_label_components(two)[two])) == 2
