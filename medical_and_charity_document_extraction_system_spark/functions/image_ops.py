"""Pure-numpy image preprocessing operators — the full E/D/K/B
inventory from SURVEY.md §2.3, re-implemented from scratch (cv2/PIL
are not installed in this container; numpy is).

Operator parity with the reference (file:line cites are to
/root/reference):

- Enhancement  E1-E8: backend/app/core/image_processors/enhancer.py
  (dispatcher :14-33, auto :35-66, clahe :68-95, histeq :97-108,
  sharpen :110-125, gamma :127-142, brightness/contrast :144-168,
  enhance_for_text :170-187)
- Denoising    D1-D9: .../denoiser.py (dispatcher :14-35, auto
  :37-57 + estimator :59-65, gaussian :67-86, median :88-100,
  bilateral :102-121, nlm :123-155, morphology :157-179,
  salt-pepper :181-190, adaptive :192-236)
- Deskewing    K1-K6 + P3: .../deskewer.py (dispatcher :14-36, auto
  fallback chain :38-61, hough :63-102, projection :104-146,
  contour :148-188, rotate :190-231, check_if_skewed :233-247)
- Binarization B1-B9: .../binarizer.py (dispatcher :14-41, auto
  :43-62, otsu :64-83, adaptive :85-116, sauvola :118-155, niblack
  :157-193, triangle :195-207, multi-scale :209-227, clean :229-251)

Same method registries, same "auto" dispatch thresholds (std<40,
mean<100/180; noise>15/8; std>50/<30; |angle|<45/2.0/0.1), same
fixed-order composition — but the kernels are our own numpy
implementations, not ports of the cv2 calls. Images are RGB (H×W×3)
or grayscale (H×W) uint8 ndarrays (see functions/netpbm.py for the
on-wire format). Everything here is deterministic: no RNG, no
wall-clock — the byte-identity contract depends on it.
"""

from __future__ import annotations

import math

import numpy as np

# --------------------------------------------------------------------------
# shared helpers
# --------------------------------------------------------------------------


def _u8(arr: np.ndarray) -> np.ndarray:
    return np.clip(np.rint(arr), 0, 255).astype(np.uint8)


def is_grayscale(image: np.ndarray) -> bool:
    return image.ndim == 2


def to_grayscale(image: np.ndarray) -> np.ndarray:
    """RGB -> luma (ITU-R BT.601 weights)."""
    if is_grayscale(image):
        return image
    f = image.astype(np.float64)
    return _u8(0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2])


def _pad_reflect(img: np.ndarray, ry: int, rx: int) -> np.ndarray:
    pw = [(ry, ry), (rx, rx)] + [(0, 0)] * (img.ndim - 2)
    return np.pad(img, pw, mode="reflect")


def _convolve2d(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """Small-kernel 2-D convolution (reflect border), float64 out.
    Applied per channel for color."""
    if img.ndim == 3:
        return np.stack(
            [_convolve2d(img[..., c], kernel) for c in range(img.shape[2])], axis=-1
        )
    kh, kw = kernel.shape
    ry, rx = kh // 2, kw // 2
    p = _pad_reflect(img.astype(np.float64), ry, rx)
    out = np.zeros(img.shape, dtype=np.float64)
    h, w = img.shape
    for dy in range(kh):
        for dx in range(kw):
            out += kernel[dy, dx] * p[dy : dy + h, dx : dx + w]
    return out


def _gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / k.sum()


def _gaussian_blur_f(img: np.ndarray, ksize: int, sigma: float = 0.0) -> np.ndarray:
    """Separable Gaussian blur, float64 out."""
    k = _gaussian_kernel1d(ksize, sigma)
    if img.ndim == 3:
        return np.stack(
            [_gaussian_blur_f(img[..., c], ksize, sigma) for c in range(img.shape[2])],
            axis=-1,
        )
    r = ksize // 2
    p = _pad_reflect(img.astype(np.float64), r, r)
    h, w = img.shape
    tmp = np.zeros((h, w + 2 * r), dtype=np.float64)
    for dy in range(ksize):
        tmp += k[dy] * p[dy : dy + h, :]
    out = np.zeros((h, w), dtype=np.float64)
    for dx in range(ksize):
        out += k[dx] * tmp[:, dx : dx + w]
    return out


def _sliding_windows(img: np.ndarray, k: int) -> np.ndarray:
    """(H, W, k, k) view of a reflect-padded image."""
    r = k // 2
    p = _pad_reflect(img, r, r)
    return np.lib.stride_tricks.sliding_window_view(p, (k, k))


def _box_stats(gray: np.ndarray, w: int) -> tuple[np.ndarray, np.ndarray]:
    """Windowed (mean, variance) via integral images — O(1) per pixel
    regardless of window size (the scale-friendly form of the
    reference's boxFilter mean/mean² at binarizer.py:118-155)."""
    r = w // 2
    k = 2 * r + 1
    f = gray.astype(np.float64)
    p = np.pad(f, r, mode="edge")
    s1 = np.pad(np.cumsum(np.cumsum(p, 0), 1), ((1, 0), (1, 0)))
    s2 = np.pad(np.cumsum(np.cumsum(p * p, 0), 1), ((1, 0), (1, 0)))
    h, wd = gray.shape
    area = float(k * k)

    def win(s):
        return (
            s[k : k + h, k : k + wd]
            - s[0:h, k : k + wd]
            - s[k : k + h, 0:wd]
            + s[0:h, 0:wd]
        )

    mean = win(s1) / area
    var = np.maximum(win(s2) / area - mean * mean, 0.0)
    return mean, var


# -- colorspace transforms (public sRGB/D65 formulas) ----------------------

_RGB2XYZ = np.array(
    [
        [0.4124564, 0.3575761, 0.1804375],
        [0.2126729, 0.7151522, 0.0721750],
        [0.0193339, 0.1191920, 0.9503041],
    ]
)
_WHITE = np.array([0.95047, 1.0, 1.08883])


def _rgb_to_lab(rgb: np.ndarray) -> np.ndarray:
    s = rgb.astype(np.float64) / 255.0
    lin = np.where(s <= 0.04045, s / 12.92, ((s + 0.055) / 1.055) ** 2.4)
    xyz = lin @ _RGB2XYZ.T / _WHITE
    d = 6.0 / 29.0
    f = np.where(xyz > d**3, np.cbrt(xyz), xyz / (3 * d * d) + 4.0 / 29.0)
    L = 116.0 * f[..., 1] - 16.0
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    return np.stack([L, a, b], axis=-1)


def _lab_to_rgb(lab: np.ndarray) -> np.ndarray:
    L, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    d = 6.0 / 29.0
    f = np.stack([fx, fy, fz], axis=-1)
    xyz = np.where(f > d, f**3, 3 * d * d * (f - 4.0 / 29.0)) * _WHITE
    lin = xyz @ np.linalg.inv(_RGB2XYZ).T
    s = np.where(lin <= 0.0031308, lin * 12.92, 1.055 * np.maximum(lin, 0) ** (1 / 2.4) - 0.055)
    return _u8(s * 255.0)


def _equalize_u8(channel: np.ndarray) -> np.ndarray:
    hist = np.bincount(channel.ravel(), minlength=256).astype(np.float64)
    cdf = np.cumsum(hist)
    nz = cdf[cdf > 0]
    if nz.size == 0:
        return channel
    cdf_min = nz[0]
    denom = max(channel.size - cdf_min, 1)
    lut = np.rint((cdf - cdf_min) / denom * 255.0).clip(0, 255).astype(np.uint8)
    return lut[channel]


# --------------------------------------------------------------------------
# E — enhancement (enhancer.py parity)
# --------------------------------------------------------------------------


def _clahe_gray(gray: np.ndarray, clip_limit: float, tiles: tuple[int, int]) -> np.ndarray:
    ty, tx = tiles
    h, w = gray.shape
    th = -(-h // ty)
    tw = -(-w // tx)
    p = np.pad(gray, ((0, ty * th - h), (0, tx * tw - w)), mode="reflect")
    blocks = p.reshape(ty, th, tx, tw).transpose(0, 2, 1, 3).reshape(ty, tx, th * tw)
    # per-tile clipped histogram -> equalization LUT
    offsets = (np.arange(ty * tx) * 256)[:, None]
    flat = blocks.reshape(ty * tx, th * tw).astype(np.int64) + offsets
    hist = np.bincount(flat.ravel(), minlength=ty * tx * 256).reshape(ty, tx, 256)
    hist = hist.astype(np.float64)
    npix = float(th * tw)
    limit = max(clip_limit * npix / 256.0, 1.0)
    excess = np.maximum(hist - limit, 0.0).sum(axis=2, keepdims=True)
    hist = np.minimum(hist, limit) + excess / 256.0
    cdf = np.cumsum(hist, axis=2)
    luts = np.clip(np.rint(cdf * 255.0 / npix), 0, 255).astype(np.uint8)
    # bilinear interpolation between the four surrounding tile LUTs
    ph, pw = p.shape
    ypos = np.clip((np.arange(ph) + 0.5) / th - 0.5, 0, ty - 1)
    xpos = np.clip((np.arange(pw) + 0.5) / tw - 0.5, 0, tx - 1)
    y0 = np.floor(ypos).astype(np.int64)
    x0 = np.floor(xpos).astype(np.int64)
    fy = (ypos - y0)[:, None]
    fx = (xpos - x0)[None, :]
    y1 = np.minimum(y0 + 1, ty - 1)
    x1 = np.minimum(x0 + 1, tx - 1)
    v = p.astype(np.int64)
    Y0, X0 = y0[:, None], x0[None, :]
    Y1, X1 = y1[:, None], x1[None, :]
    out = (
        (1 - fy) * (1 - fx) * luts[Y0, X0, v]
        + fy * (1 - fx) * luts[Y1, X0, v]
        + (1 - fy) * fx * luts[Y0, X1, v]
        + fy * fx * luts[Y1, X1, v]
    )
    return _u8(out[:h, :w])


def apply_clahe(
    image: np.ndarray,
    clip_limit: float = 3.0,
    tile_grid_size: tuple[int, int] = (8, 8),
) -> np.ndarray:
    """E3 — gray: direct; color: CLAHE on L of LAB (enhancer.py:68-95)."""
    if is_grayscale(image):
        return _clahe_gray(image, clip_limit, tile_grid_size)
    lab = _rgb_to_lab(image)
    l_u8 = _u8(lab[..., 0] * 255.0 / 100.0)
    lab[..., 0] = _clahe_gray(l_u8, clip_limit, tile_grid_size).astype(np.float64) * 100.0 / 255.0
    return _lab_to_rgb(lab)


def histogram_equalization(image: np.ndarray) -> np.ndarray:
    """E4 — gray direct; color on Y of YUV (enhancer.py:97-108)."""
    if is_grayscale(image):
        return _equalize_u8(image)
    f = image.astype(np.float64)
    y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    u = f[..., 2] - y
    v = f[..., 0] - y
    y_eq = _equalize_u8(_u8(y)).astype(np.float64)
    r = y_eq + v
    b = y_eq + u
    g = (y_eq - 0.299 * r - 0.114 * b) / 0.587
    return _u8(np.stack([r, g, b], axis=-1))


def sharpen(image: np.ndarray, strength: float = 1.0) -> np.ndarray:
    """E5 — brightness-preserving 3×3 sharpen: center 1+8s, ring −s
    (enhancer.py:110-125)."""
    k = np.full((3, 3), -strength, dtype=np.float64)
    k[1, 1] = 1.0 + 8.0 * strength
    return _u8(_convolve2d(image, k))


def gamma_correction(image: np.ndarray, gamma: float = 1.0) -> np.ndarray:
    """E6 — 256-entry LUT ``(i/255)^(1/γ)·255`` (enhancer.py:127-142)."""
    inv = 1.0 / max(gamma, 1e-9)
    lut = _u8(((np.arange(256) / 255.0) ** inv) * 255.0)
    return lut[image]


def adjust_brightness_contrast(
    image: np.ndarray, brightness: float = 0.0, contrast: float = 1.0
) -> np.ndarray:
    """E7 — linear ``contrast·(img−128)+128+brightness``, clipped
    (enhancer.py:144-168)."""
    f = image.astype(np.float64)
    return _u8(contrast * (f - 128.0) + 128.0 + brightness)


def enhance_for_text(image: np.ndarray) -> np.ndarray:
    """E8 — gray -> CLAHE(2.0) -> half-strength sharpen
    (enhancer.py:170-187)."""
    g = to_grayscale(image)
    return sharpen(_clahe_gray(g, 2.0, (8, 8)), strength=0.5)


def _auto_enhance(image: np.ndarray) -> np.ndarray:
    """E2 — std<40 -> CLAHE(3.0); mean<100 -> gamma 1.5; mean>180 ->
    gamma 0.7; else CLAHE(2.0) (enhancer.py:35-66)."""
    g = to_grayscale(image)
    std = float(g.std())
    mean = float(g.mean())
    if std < 40.0:
        return apply_clahe(image, clip_limit=3.0)
    if mean < 100.0:
        return gamma_correction(image, 1.5)
    if mean > 180.0:
        return gamma_correction(image, 0.7)
    return apply_clahe(image, clip_limit=2.0)


_ENHANCE_METHODS = {
    "auto": lambda img: _auto_enhance(img),
    "clahe": lambda img: apply_clahe(img),
    "histogram": lambda img: histogram_equalization(img),
    "sharpen": lambda img: sharpen(img),
    "gamma": lambda img: gamma_correction(img, 1.2),
}


def enhance(image: np.ndarray, method: str = "auto") -> np.ndarray:
    """E1 — method registry dispatcher (enhancer.py:14-33)."""
    try:
        fn = _ENHANCE_METHODS[method]
    except KeyError:
        raise ValueError(f"unknown enhancement method: {method!r}") from None
    return fn(image)


# --------------------------------------------------------------------------
# D — denoising (denoiser.py parity)
# --------------------------------------------------------------------------


_IMMERKAER = np.array([[1, -2, 1], [-2, 4, -2], [1, -2, 1]], dtype=np.float64)


def estimate_noise(image: np.ndarray) -> float:
    """Laplacian-response noise estimate (denoiser.py:59-65), using
    Immerkær's fast noise-variance method (J. Immerkær, "Fast Noise
    Variance Estimation", CVIU 1996): σ ≈ √(π/2) · Σ|M∗I| / (6·(W−2)(H−2))
    with the difference-of-Laplacians mask M, which cancels true image
    structure and responds to pixel noise."""
    g = to_grayscale(image).astype(np.float64)
    h, w = g.shape
    if h < 3 or w < 3:
        return 0.0
    resp = _convolve2d(g, _IMMERKAER)[1:-1, 1:-1]  # drop padded border
    return float(
        math.sqrt(math.pi / 2.0) * np.abs(resp).sum() / (6.0 * (w - 2) * (h - 2))
    )


def gaussian_denoise(image: np.ndarray, kernel_size: int = 5, sigma: float = 0.0) -> np.ndarray:
    """D3 (denoiser.py:67-86)."""
    return _u8(_gaussian_blur_f(image, kernel_size, sigma))


def median_denoise(image: np.ndarray, kernel_size: int = 5) -> np.ndarray:
    """D4 (denoiser.py:88-100)."""
    if image.ndim == 3:
        return np.stack(
            [median_denoise(image[..., c], kernel_size) for c in range(image.shape[2])],
            axis=-1,
        )
    win = _sliding_windows(image, kernel_size)
    return np.median(win, axis=(2, 3)).astype(np.uint8)


def bilateral_denoise(
    image: np.ndarray, d: int = 9, sigma_color: float = 75.0, sigma_space: float = 75.0
) -> np.ndarray:
    """D5 — edge-preserving: weight = spatial · exp(−Δ²/2σc²)
    (denoiser.py:102-121)."""
    f = image.astype(np.float64)
    r = d // 2
    p = _pad_reflect(f, r, r)
    h, w = image.shape[:2]
    acc = np.zeros_like(f)
    wsum = np.zeros(image.shape[:2], dtype=np.float64)
    inv2sc = 1.0 / (2.0 * sigma_color * sigma_color)
    inv2ss = 1.0 / (2.0 * sigma_space * sigma_space)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            shifted = p[r + dy : r + dy + h, r + dx : r + dx + w]
            diff = shifted - f
            dist2 = diff * diff if f.ndim == 2 else (diff * diff).sum(axis=-1)
            wgt = math.exp(-(dy * dy + dx * dx) * inv2ss) * np.exp(-dist2 * inv2sc)
            wsum += wgt
            acc += shifted * (wgt if f.ndim == 2 else wgt[..., None])
    return _u8(acc / (wsum if f.ndim == 2 else wsum[..., None]))


def nlm_denoise(
    image: np.ndarray, h: float = 10.0, template_window: int = 7, search_window: int = 21
) -> np.ndarray:
    """D6 — non-local means, fast approximation: per-offset patch
    distance = box-filtered squared difference (denoiser.py:123-155)."""
    if image.ndim == 3:
        return np.stack(
            [
                nlm_denoise(image[..., c], h, template_window, search_window)
                for c in range(image.shape[2])
            ],
            axis=-1,
        )
    f = image.astype(np.float64)
    sr = search_window // 2
    p = _pad_reflect(f, sr, sr)
    hh, ww = f.shape
    acc = np.zeros_like(f)
    wsum = np.zeros_like(f)
    inv_h2 = 1.0 / (h * h)
    tk = np.full((template_window, template_window), 1.0 / (template_window**2))
    for dy in range(-sr, sr + 1):
        for dx in range(-sr, sr + 1):
            shifted = p[sr + dy : sr + dy + hh, sr + dx : sr + dx + ww]
            d2 = _convolve2d((shifted - f) ** 2, tk)
            wgt = np.exp(-d2 * inv_h2)
            wsum += wgt
            acc += wgt * shifted
    return _u8(acc / wsum)


def morphological_denoise(image: np.ndarray, kernel_size: int = 3) -> np.ndarray:
    """D7 — grayscale open then close, rect kernel (denoiser.py:157-179)."""
    if image.ndim == 3:
        return np.stack(
            [morphological_denoise(image[..., c], kernel_size) for c in range(image.shape[2])],
            axis=-1,
        )

    def erode(img):
        return _sliding_windows(img, kernel_size).min(axis=(2, 3))

    def dilate(img):
        return _sliding_windows(img, kernel_size).max(axis=(2, 3))

    opened = dilate(erode(image))
    closed = erode(dilate(opened))
    return closed.astype(np.uint8)


def remove_salt_pepper(image: np.ndarray, kernel_size: int = 5) -> np.ndarray:
    """D8 (denoiser.py:181-190)."""
    return median_denoise(image, kernel_size)


def _auto_denoise(image: np.ndarray) -> np.ndarray:
    """D2 — noise estimate >15 bilateral, >8 median, else Gaussian k=3
    (denoiser.py:37-57)."""
    level = estimate_noise(image)
    if level > 15.0:
        return bilateral_denoise(image)
    if level > 8.0:
        return median_denoise(image)
    return gaussian_denoise(image, kernel_size=3)


def adaptive_denoise(image: np.ndarray, block: int = 64) -> np.ndarray:
    """D9 — per-64px-block noise-adaptive filter choice
    (denoiser.py:192-236)."""
    out = image.copy()
    h, w = image.shape[:2]
    for y0 in range(0, h, block):
        for x0 in range(0, w, block):
            tile = image[y0 : y0 + block, x0 : x0 + block]
            out[y0 : y0 + block, x0 : x0 + block] = _auto_denoise(tile)
    return out


_DENOISE_METHODS = {
    "auto": _auto_denoise,
    "gaussian": lambda img: gaussian_denoise(img),
    "median": lambda img: median_denoise(img),
    "bilateral": lambda img: bilateral_denoise(img),
    "nlm": lambda img: nlm_denoise(img),
    "morphology": lambda img: morphological_denoise(img),
}


def denoise(image: np.ndarray, method: str = "auto") -> np.ndarray:
    """D1 — dispatcher (denoiser.py:14-35)."""
    try:
        fn = _DENOISE_METHODS[method]
    except KeyError:
        raise ValueError(f"unknown denoise method: {method!r}") from None
    return fn(image)


# --------------------------------------------------------------------------
# K — deskewing (deskewer.py parity).  Convention: detect_* return the
# CCW skew angle in degrees; deskew() corrects by rotating −angle.
# --------------------------------------------------------------------------

_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.float64)


def _edges(gray: np.ndarray, high: float = 150.0) -> np.ndarray:
    gx = _convolve2d(gray, _SOBEL_X)
    gy = _convolve2d(gray, _SOBEL_X.T)
    mag = np.hypot(gx, gy)
    mx = mag.max()
    if mx <= 0:
        return np.zeros_like(gray, dtype=bool)
    return (mag * 255.0 / mx) > high


def detect_skew_hough(
    image: np.ndarray,
    canny_low: float = 50.0,
    canny_high: float = 150.0,
    hough_threshold: int = 100,
) -> float:
    """K3 — gradient edges -> Hough accumulator (ρ=1px, θ=1°) ->
    median of (θ°−90) over peaks with |·|<45 (deskewer.py:63-102)."""
    gray = to_grayscale(image).astype(np.float64)
    edges = _edges(gray, canny_high)
    ys, xs = np.nonzero(edges)
    if ys.size == 0:
        return 0.0
    if ys.size > 20000:  # deterministic subsample
        stride = ys.size // 20000 + 1
        ys, xs = ys[::stride], xs[::stride]
    thetas = np.deg2rad(np.arange(180, dtype=np.float64))
    cos_t, sin_t = np.cos(thetas), np.sin(thetas)
    h, w = gray.shape
    diag = int(math.hypot(h, w)) + 1
    rho = np.rint(xs[:, None] * cos_t + ys[:, None] * sin_t).astype(np.int64) + diag
    acc = np.zeros((2 * diag + 1, 180), dtype=np.int64)
    t_idx = np.broadcast_to(np.arange(180), rho.shape)
    np.add.at(acc, (rho.ravel(), t_idx.ravel()), 1)
    peaks = np.argwhere(acc >= hough_threshold)
    if peaks.size == 0:
        return 0.0
    angles = peaks[:, 1].astype(np.float64) - 90.0
    angles = angles[np.abs(angles) < 45.0]
    if angles.size == 0:
        return 0.0
    # image y-axis points down: Hough θ−90 is the clockwise tilt of
    # near-horizontal lines; negate to report CCW skew.
    return float(-np.median(angles))


def _rotate_nn_binary(binary: np.ndarray, angle_deg: float) -> np.ndarray:
    """Nearest-neighbor same-canvas rotation of a 0/1 array (used only
    for projection-profile scoring)."""
    h, w = binary.shape
    rad = math.radians(angle_deg)
    c, s = math.cos(rad), math.sin(rad)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float64), np.arange(w, dtype=np.float64), indexing="ij")
    # inverse map (rotate output coords by −angle around center)
    xs = c * (xx - cx) - s * (yy - cy) + cx
    ys = s * (xx - cx) + c * (yy - cy) + cy
    xi = np.rint(xs).astype(np.int64)
    yi = np.rint(ys).astype(np.int64)
    ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    out = np.zeros_like(binary)
    out[ok] = binary[yi[ok], xi[ok]]
    return out


def detect_skew_projection(
    image: np.ndarray, angle_range: float = 45.0, step: float = 0.5
) -> float:
    """K4 — Otsu-inverted binary; brute-force rotation sweep maximizing
    row-projection-profile variance (deskewer.py:104-146)."""
    gray = to_grayscale(image)
    # downscale for the sweep (deterministic stride) — scoring only
    stride = max(1, max(gray.shape) // 400)
    small = gray[::stride, ::stride]
    t = _otsu_threshold(small)
    binary = (small <= t).astype(np.float64)  # text=1
    best_angle, best_score = 0.0, -1.0
    for a in np.arange(-angle_range, angle_range + step / 2, step):
        prof = _rotate_nn_binary(binary, a).sum(axis=1)
        score = float(np.var(prof))
        if score > best_score:
            best_score, best_angle = score, float(a)
    # rotating by −skew aligns rows, so the best sweep angle is −skew
    return -best_angle


def _label_components(binary: np.ndarray) -> np.ndarray:
    """8-connected component labels via two-pass run-length
    union-find (no scipy/cv2) — O(H·W) for ANY component shape
    (a naive min-propagation sweep is O(path length) per image and
    degrades quadratically on serpentine components).
    0 = background; labels are positive ints (root-canonical)."""
    h, w = binary.shape
    labels = np.zeros((h, w), dtype=np.int64)
    parent: list[int] = []

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> int:
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra > rb:
                ra, rb = rb, ra
            parent[rb] = ra
        return ra

    prev_runs: list[tuple[int, int, int]] = []  # (start, end_excl, label)
    pad = np.zeros(1, dtype=np.int8)
    for r in range(h):
        row = binary[r].astype(np.int8)
        edges = np.flatnonzero(np.diff(np.concatenate((pad, row, pad))))
        cur: list[tuple[int, int, int]] = []
        j = 0
        for s, e in zip(edges[0::2], edges[1::2]):
            s, e = int(s), int(e)
            # prev run [ps, pe) 8-connects iff ps <= e and pe >= s
            while j < len(prev_runs) and prev_runs[j][1] < s:
                j += 1
            lbl = -1
            k = j
            while k < len(prev_runs) and prev_runs[k][0] <= e:
                lbl = find(prev_runs[k][2]) if lbl < 0 else union(lbl, prev_runs[k][2])
                k += 1
            if lbl < 0:
                lbl = len(parent)
                parent.append(lbl)
            cur.append((s, e, lbl))
            labels[r, s:e] = lbl + 1  # provisional
        prev_runs = cur
    if parent:
        lut = np.concatenate(
            ([0], np.array([find(i) for i in range(len(parent))], dtype=np.int64) + 1)
        )
        labels = lut[labels]
    return labels


def detect_skew_contour(image: np.ndarray) -> float:
    """K5 — orientation of the largest foreground component via image
    moments (the minAreaRect stand-in), normalized to (−45, 45]
    (deskewer.py:148-188)."""
    gray = to_grayscale(image)
    t = _otsu_threshold(gray)
    binary = gray <= t
    lab = _label_components(binary)
    if lab.max() == 0:
        return 0.0
    ids, counts = np.unique(lab[lab > 0], return_counts=True)
    big = ids[np.argmax(counts)]
    ys, xs = np.nonzero(lab == big)
    y = ys.astype(np.float64) - ys.mean()
    x = xs.astype(np.float64) - xs.mean()
    mu11 = float((x * y).mean())
    mu20 = float((x * x).mean())
    mu02 = float((y * y).mean())
    theta = 0.5 * math.atan2(2.0 * mu11, mu20 - mu02)
    ang = math.degrees(theta)
    while ang <= -45.0:
        ang += 90.0
    while ang > 45.0:
        ang -= 90.0
    # y-down coords: positive moment angle = clockwise; negate for CCW
    return -ang


def rotate_image(
    image: np.ndarray, angle: float, background: tuple[int, int, int] = (255, 255, 255)
) -> np.ndarray:
    """K6 — identity if |angle|<0.1°; expanded-canvas bilinear rotation
    (CCW positive), background fill (deskewer.py:190-231)."""
    if abs(angle) < 0.1:
        return image.copy()
    h, w = image.shape[:2]
    rad = math.radians(angle)
    c, s = math.cos(rad), math.sin(rad)
    nw = int(abs(w * c) + abs(h * s) + 0.5)
    nh = int(abs(w * s) + abs(h * c) + 0.5)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ncy, ncx = (nh - 1) / 2.0, (nw - 1) / 2.0
    yy, xx = np.meshgrid(np.arange(nh, dtype=np.float64), np.arange(nw, dtype=np.float64), indexing="ij")
    # inverse map: rotate output coords by −angle (CCW image rotation
    # in y-down coordinates)
    xs = c * (xx - ncx) - s * (yy - ncy) + cx
    ys = s * (xx - ncx) + c * (yy - ncy) + cy
    x0 = np.floor(xs).astype(np.int64)
    y0 = np.floor(ys).astype(np.int64)
    fx = xs - x0
    fy = ys - y0
    x0c = np.clip(x0, 0, w - 1)
    x1c = np.clip(x0 + 1, 0, w - 1)
    y0c = np.clip(y0, 0, h - 1)
    y1c = np.clip(y0 + 1, 0, h - 1)
    inside = (xs >= -0.5) & (xs <= w - 0.5) & (ys >= -0.5) & (ys <= h - 0.5)

    def sample(img2d):
        v = (
            img2d[y0c, x0c] * (1 - fy) * (1 - fx)
            + img2d[y1c, x0c] * fy * (1 - fx)
            + img2d[y0c, x1c] * (1 - fy) * fx
            + img2d[y1c, x1c] * fy * fx
        )
        return v

    if image.ndim == 2:
        out = sample(image.astype(np.float64))
        out[~inside] = float(background[0])
        return _u8(out)
    chans = []
    for ci in range(image.shape[2]):
        v = sample(image[..., ci].astype(np.float64))
        v[~inside] = float(background[ci % len(background)])
        chans.append(v)
    return _u8(np.stack(chans, axis=-1))


def check_if_skewed(image: np.ndarray, threshold: float = 2.0) -> bool:
    """P3 — |detected angle| > threshold (deskewer.py:233-247)."""
    return abs(_detect_auto(image)) > threshold


def _detect_auto(image: np.ndarray) -> float:
    """Auto detection chain: Hough (accept |a|<45) -> projection ->
    0.0, with the reference's swallow-and-fall-back semantics
    (deskewer.py:38-61)."""
    try:
        a = detect_skew_hough(image)
        if 0.0 < abs(a) < 45.0:
            return a
    except Exception:
        pass
    try:
        a = detect_skew_projection(image)
        if abs(a) < 45.0:
            return a
    except Exception:
        pass
    return 0.0


def _auto_deskew(image: np.ndarray) -> tuple[np.ndarray, float]:
    """K2 (deskewer.py:38-61)."""
    angle = _detect_auto(image)
    return rotate_image(image, -angle), angle


_DESKEW_METHODS = {
    "auto": _auto_deskew,
    "hough": lambda img: (lambda a: (rotate_image(img, -a), a))(detect_skew_hough(img)),
    "projection": lambda img: (lambda a: (rotate_image(img, -a), a))(
        detect_skew_projection(img)
    ),
    "contour": lambda img: (lambda a: (rotate_image(img, -a), a))(detect_skew_contour(img)),
}


def deskew(image: np.ndarray, method: str = "auto") -> tuple[np.ndarray, float]:
    """K1 — dispatcher; returns (corrected image, detected angle)
    (deskewer.py:14-36)."""
    try:
        fn = _DESKEW_METHODS[method]
    except KeyError:
        raise ValueError(f"unknown deskew method: {method!r}") from None
    return fn(image)


# --------------------------------------------------------------------------
# B — binarization (binarizer.py parity).  Always grayscales first
# (binarizer.py:22-25); output values ∈ {0, 255}.
# --------------------------------------------------------------------------


def _otsu_threshold(gray: np.ndarray) -> int:
    hist = np.bincount(gray.ravel(), minlength=256).astype(np.float64)
    total = float(gray.size)
    w0 = np.cumsum(hist)
    w1 = total - w0
    cum_mean = np.cumsum(hist * np.arange(256))
    mean_all = cum_mean[-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        mu0 = cum_mean / w0
        mu1 = (mean_all - cum_mean) / w1
    between = w0 * w1 * (mu0 - mu1) ** 2
    between[(w0 == 0) | (w1 == 0)] = -1.0
    between = np.nan_to_num(between, nan=-1.0)
    return int(np.argmax(between))


def otsu_binarize(image: np.ndarray, invert: bool = False) -> np.ndarray:
    """B3 (binarizer.py:64-83)."""
    gray = to_grayscale(image)
    t = _otsu_threshold(gray)
    out = np.where(gray > t, 255, 0).astype(np.uint8)
    return (255 - out) if invert else out


def adaptive_binarize(
    image: np.ndarray, block_size: int = 11, c: float = 2.0, gaussian: bool = True
) -> np.ndarray:
    """B4 — local-mean threshold ``pixel > μ_local − c``; even block
    sizes bumped to odd (binarizer.py:85-116)."""
    gray = to_grayscale(image)
    if block_size % 2 == 0:
        block_size += 1
    if gaussian:
        local = _gaussian_blur_f(gray, block_size)
    else:
        local, _ = _box_stats(gray, block_size)
    return np.where(gray.astype(np.float64) > local - c, 255, 0).astype(np.uint8)


def sauvola_binarize(
    image: np.ndarray, window: int = 15, k: float = 0.2, r: float = 128.0
) -> np.ndarray:
    """B5 — ``T = μ(1+k(σ/r−1))`` over integral-image window stats
    (binarizer.py:118-155)."""
    gray = to_grayscale(image)
    mean, var = _box_stats(gray, window)
    thresh = mean * (1.0 + k * (np.sqrt(var) / r - 1.0))
    return np.where(gray.astype(np.float64) > thresh, 255, 0).astype(np.uint8)


def niblack_binarize(image: np.ndarray, window: int = 15, k: float = -0.2) -> np.ndarray:
    """B6 — ``T = μ + kσ`` (binarizer.py:157-193)."""
    gray = to_grayscale(image)
    mean, var = _box_stats(gray, window)
    thresh = mean + k * np.sqrt(var)
    return np.where(gray.astype(np.float64) > thresh, 255, 0).astype(np.uint8)


def triangle_binarize(image: np.ndarray) -> np.ndarray:
    """B7 — triangle-algorithm global threshold (binarizer.py:195-207)."""
    gray = to_grayscale(image)
    hist = np.bincount(gray.ravel(), minlength=256).astype(np.float64)
    nz = np.nonzero(hist)[0]
    if nz.size == 0:
        return np.zeros_like(gray)
    peak = int(np.argmax(hist))
    lo, hi = int(nz[0]), int(nz[-1])
    far = hi if (peak - lo) < (hi - peak) else lo
    if far == peak:
        t = peak
    else:
        idx = np.arange(min(peak, far), max(peak, far) + 1)
        # distance from hist points to the peak->far line
        x1, y1 = float(peak), hist[peak]
        x2, y2 = float(far), 0.0
        num = np.abs((y2 - y1) * idx - (x2 - x1) * hist[idx] + x2 * y1 - y2 * x1)
        t = int(idx[np.argmax(num)])
    return np.where(gray > t, 255, 0).astype(np.uint8)


def multi_scale_binarize(image: np.ndarray, scales: tuple[int, ...] = (11, 21, 31)) -> np.ndarray:
    """B8 — median-combine adaptive binarization at several block
    sizes (binarizer.py:209-227)."""
    stack = np.stack([adaptive_binarize(image, block_size=s) for s in scales])
    return np.median(stack, axis=0).astype(np.uint8)


def clean_binary_image(image: np.ndarray, min_area: int = 20) -> np.ndarray:
    """B9 — connected components over the dark (ink) foreground; blobs
    smaller than min_area are flipped to background
    (binarizer.py:229-251)."""
    fg = image == 0
    lab = _label_components(fg)
    if lab.max() == 0:
        return image.copy()
    ids, counts = np.unique(lab[lab > 0], return_counts=True)
    small = set(ids[counts < min_area].tolist())
    if not small:
        return image.copy()
    kill = np.isin(lab, list(small))
    out = image.copy()
    out[kill] = 255
    return out


def _auto_binarize(image: np.ndarray) -> np.ndarray:
    """B2 — std>50 Otsu; std<30 adaptive; else Sauvola
    (binarizer.py:43-62)."""
    gray = to_grayscale(image)
    std = float(gray.std())
    if std > 50.0:
        return otsu_binarize(gray)
    if std < 30.0:
        return adaptive_binarize(gray)
    return sauvola_binarize(gray)


_BINARIZE_METHODS = {
    "auto": _auto_binarize,
    "otsu": lambda img: otsu_binarize(img),
    "adaptive": lambda img: adaptive_binarize(img),
    "sauvola": lambda img: sauvola_binarize(img),
    "niblack": lambda img: niblack_binarize(img),
    "triangle": lambda img: triangle_binarize(img),
}


def binarize(image: np.ndarray, method: str = "auto") -> np.ndarray:
    """B1 — dispatcher (binarizer.py:14-41)."""
    try:
        fn = _BINARIZE_METHODS[method]
    except KeyError:
        raise ValueError(f"unknown binarization method: {method!r}") from None
    return fn(image)


# --------------------------------------------------------------------------
# X4/X5 — document-type presets + fixed-order pipeline composer
# (preprocessing_service.py:82-153)
# --------------------------------------------------------------------------

DOCUMENT_TYPE_PRESETS: dict[str, dict[str, bool]] = {
    "general": {"enhance": True, "denoise": True, "deskew": True, "binarize": True},
}


def preprocess_image_array(
    image: np.ndarray, document_type: str = "general"
) -> tuple[np.ndarray, dict]:
    """Fixed-order enhance -> denoise -> deskew -> binarize, each gated
    by the document-type preset, accumulating ``steps_applied`` and
    ``skew_angle`` metadata (preprocessing_service.py:82-133; unknown
    types fall back to "general", :135-153)."""
    preset = DOCUMENT_TYPE_PRESETS.get(document_type, DOCUMENT_TYPE_PRESETS["general"])
    meta: dict = {"steps_applied": [], "skew_angle": 0.0}
    out = image
    if preset.get("enhance", True):
        out = enhance(out, "auto")
        meta["steps_applied"].append("enhance")
    if preset.get("denoise", True):
        out = denoise(out, "auto")
        meta["steps_applied"].append("denoise")
    if preset.get("deskew", True):
        out, angle = deskew(out, "auto")
        meta["skew_angle"] = float(angle)
        meta["steps_applied"].append("deskew")
    if preset.get("binarize", True):
        out = binarize(out, "auto")
        meta["steps_applied"].append("binarize")
    return out, meta
