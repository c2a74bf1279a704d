"""Host-side image / pulse-shape-profile transforms.

Numpy + PIL reimplementations of the reference transform set
(reference: src/data.py:62-319). Decode/resize are host work (not TPU work),
so they live in the input pipeline; the per-batch hot parts (normalize,
rescale, noise) are cheap numpy ops fused into batch assembly.

Determinism: every stochastic transform takes an explicit
``numpy.random.Generator``. The reference relies on global ``random`` /
``torch`` RNG state (reference: src/data.py:201, 135).

Conventions:
* images are channel-last ``(H, W, 1)`` float32 — the TPU/XLA-friendly layout
  (the reference uses torch NCHW),
* profiles are ``(L, D)`` float32 with D = 6 pulse channels.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
from PIL import Image

# Per-channel log-space ceilings, log(1+max) over the training corpora,
# derived in the reference's analysis notebook (reference: analysis.ipynb
# cells 12-14, hard-coded at src/data.py:127,146).
PROFILE_LOG_CEILINGS = np.array(
    [9.6058, 8.9211, 8.9211, 8.9211, 8.9211, 8.9211], dtype=np.float32
)

SCALEBAR_ROWS = 25  # burned-in scale bar occupies the top 25 px (src/data.py:77)

_default_rng = np.random.default_rng(0)


def _rng(rng: Optional[np.random.Generator]) -> np.random.Generator:
    return rng if rng is not None else _default_rng


# ---------------------------------------------------------------------------
# image primitives
# ---------------------------------------------------------------------------

def find_background_stats(image: np.ndarray, p: int = 2,
                          closest: float = 0.80) -> Tuple[np.ndarray, np.ndarray]:
    """Background mode / std from the image rim of thickness ``p``.

    Mirrors reference src/data.py:214-241: mode over rim pixels, std over the
    ``closest`` fraction of rim pixels nearest (L2) to the mode.

    NOTE: the reference concatenates ``image[:, :-p]`` — everything except the
    last ``p`` columns — into its "rim", which looks like a typo for
    ``image[:, -p:]`` and makes the statistics near-global. We implement the
    evident intent (true rim: first/last ``p`` rows and columns).
    """
    c = 1 if image.ndim < 3 else image.shape[-1]
    edges = np.concatenate(
        [
            image[:, :p].reshape(-1, c),
            image[:, -p:].reshape(-1, c),
            image[:p, :].reshape(-1, c),
            image[-p:, :].reshape(-1, c),
        ],
        axis=0,
    )
    # per-channel mode (scipy.stats.mode equivalent for small int images)
    color_mode = np.empty(c, dtype=edges.dtype)
    for ch in range(c):
        vals, counts = np.unique(edges[:, ch], return_counts=True)
        color_mode[ch] = vals[np.argmax(counts)]
    n_closest = int(edges.shape[0] * closest)
    distances = np.sum((edges.astype(np.int64) - color_mode.astype(np.int64)) ** 2, axis=1)
    closest_indices = np.argpartition(distances, min(n_closest, len(distances) - 1))[:n_closest]
    color_std = np.std(edges[closest_indices].astype(float), axis=0)
    return color_mode, color_std


def cover_scale(image: np.ndarray, bg: np.ndarray, std: np.ndarray,
                rng: Optional[np.random.Generator] = None,
                rows: int = SCALEBAR_ROWS) -> np.ndarray:
    """Overwrite the burned-in scale bar (top ``rows`` px) with Gaussian
    background noise (reference: src/data.py:207-211)."""
    g = _rng(rng)
    image = image.copy()
    noise = g.normal(loc=float(np.mean(bg)), scale=float(np.mean(std)) + 1e-8,
                     size=image[:rows].shape)
    image[:rows] = np.clip(noise, 0, 255).astype(image.dtype)
    return image


def pad_image_to_square(image: np.ndarray, bg: np.ndarray, std: np.ndarray,
                        rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Center-pad to square with background noise (reference: src/data.py:244-264)."""
    g = _rng(rng)
    height, width = image.shape[:2]
    max_side = max(height, width)
    y_from = (max_side - height) // 2
    x_from = (max_side - width) // 2
    if x_from > 0 or y_from > 0:
        shape = (max_side, max_side) + image.shape[2:]
        canvas = np.full(shape, fill_value=float(np.mean(bg)), dtype=np.float64)
        canvas += g.normal(loc=0.0, scale=float(np.mean(std)) + 1e-8, size=shape)
        out = np.clip(canvas, 0, 255).astype(image.dtype)
        out[y_from:y_from + height, x_from:x_from + width] = image
        return out
    return image


def resize_edge(img: Image.Image, target_res: int = 224) -> np.ndarray:
    """Aspect-preserving LANCZOS resize of the long side to ``target_res``,
    then center-pad the short side with edge replication
    (reference: src/data.py:267-306, ``edge=True`` branch).

    Returns uint8 (target_res, target_res) for 'L' input or (..., C) for RGB.
    """
    w, h = img.size
    if h <= w:
        new_h = int(np.around(target_res * h / w))
        img = img.resize((target_res, new_h), Image.Resampling.LANCZOS)
        arr = np.asarray(img)
        top = (target_res - new_h) // 2
        bottom = target_res - new_h - top
        pad = [(top, bottom), (0, 0)] + [(0, 0)] * (arr.ndim - 2)
        arr = np.pad(arr, pad, mode="edge")
    else:
        new_w = int(np.around(target_res * w / h))
        img = img.resize((new_w, target_res), Image.Resampling.LANCZOS)
        arr = np.asarray(img)
        left = (target_res - new_w) // 2
        right = target_res - new_w - left
        pad = [(0, 0), (left, right)] + [(0, 0)] * (arr.ndim - 2)
        arr = np.pad(arr, pad, mode="edge")
    return arr


def to_grayscale(arr: np.ndarray) -> np.ndarray:
    """ITU-R 601-2 luma transform, matching torchvision's rgb_to_grayscale
    (the source crops are grayscale JPEGs, so R=G=B and this is exact)."""
    if arr.ndim == 2:
        return arr
    r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
    lum = 0.2989 * r + 0.587 * g + 0.114 * b
    if arr.dtype == np.uint8:
        return lum.astype(np.uint8)
    return lum.astype(arr.dtype)


# ---------------------------------------------------------------------------
# profile primitives
# ---------------------------------------------------------------------------

def resample_linear(profile: np.ndarray, target_len: int,
                    antialias: bool = True) -> np.ndarray:
    """Resample a (L, D) profile to (target_len, D) along the time axis.

    Matches torchvision v2 bilinear ``Resize`` with ``antialias=True`` and
    ``align_corners=False`` (reference applies it to a (D, 1, L) view,
    src/data.py:133,152,315-319): output sample i maps to input coordinate
    (i + 0.5) * L / target_len - 0.5; when downsampling, a triangle filter of
    support L/target_len is applied.
    """
    profile = np.asarray(profile, dtype=np.float32)
    L = profile.shape[0]
    if L == 0:
        # empty profiles exist: preprocess drops non-positive rows and can
        # drop them all (datagen/preprocess_*.py); resample to silence
        return np.zeros((target_len, profile.shape[1]), np.float32)
    if L == target_len:
        return profile
    scale = L / target_len
    support = max(1.0, scale) if antialias else 1.0
    centers = (np.arange(target_len, dtype=np.float64) + 0.5) * scale - 0.5
    lo = np.floor(centers - support).astype(np.int64)
    width = int(math.ceil(2 * support)) + 1
    offsets = np.arange(width)
    idx = lo[:, None] + offsets[None, :]            # (T, W)
    dist = np.abs(idx - centers[:, None]) / support
    weights = np.clip(1.0 - dist, 0.0, None)        # triangle kernel
    # PIL/torchvision truncate the window at the boundary and renormalize
    # (no border replication).
    weights = np.where((idx >= 0) & (idx < L), weights, 0.0)
    idx = np.clip(idx, 0, L - 1)
    weights = weights / np.maximum(weights.sum(axis=1, keepdims=True), 1e-12)
    out = np.einsum("tw,twd->td", weights, profile[idx])
    return out.astype(np.float32)


def constrain_len(profile: np.ndarray, max_len: int = 512) -> np.ndarray:
    """Cap profile length at ``max_len`` via resampling
    (reference: src/data.py:309-312)."""
    return resample_linear(profile, max_len) if profile.shape[0] > max_len else profile


# ---------------------------------------------------------------------------
# transform callables (API-parity with reference src/data.py classes)
# ---------------------------------------------------------------------------

class ImageTransforms:
    """Raw canonicalization for the supervised baselines
    (reference: src/data.py:62-70): estimate background stats from the rim,
    overwrite the scale bar with background noise, center-pad to square,
    scale to float [0, 1].

    Deviation: the reference leaves images at their native (variable) size,
    which cannot be batched with static shapes; when ``target_size`` is given
    we additionally LANCZOS-resize the canonical square to a fixed size
    (default 224, matching the backbones' input resolution).
    """

    def __init__(self, target_size: Optional[int] = 224) -> None:
        self.target_size = target_size

    def __call__(self, image: Image.Image | np.ndarray,
                 rng: Optional[np.random.Generator] = None) -> np.ndarray:
        if isinstance(image, Image.Image):
            image = np.asarray(image.convert("L"))
        elif image.ndim == 3:
            image = to_grayscale(image)
        bg, std = find_background_stats(image)
        image = cover_scale(image, bg, std, rng)
        image = pad_image_to_square(image, bg, std, rng)
        if self.target_size is not None and image.shape[0] != self.target_size:
            pil = Image.fromarray(image)
            pil = pil.resize((self.target_size, self.target_size),
                             Image.Resampling.LANCZOS)
            image = np.asarray(pil)
        out = image.astype(np.float32) / 255.0
        return out[..., None]  # (H, W, 1)


class ImageTransformTrain:
    """Train-time image transform (reference: src/data.py:73-90):
    crop the top 25 scale-bar rows -> aspect-preserving resize to
    ceil(1.05 * target) with edge padding -> grayscale -> float [0,1] ->
    rescale to [-1, 1] -> random crop target -> random vertical flip."""

    def __init__(self, target_size: int = 224) -> None:
        self.target_size = target_size
        self.oversize = math.ceil(1.05 * target_size)

    def __call__(self, img: Image.Image,
                 rng: Optional[np.random.Generator] = None) -> np.ndarray:
        g = _rng(rng)
        img = img.convert("L")
        img = img.crop((0, SCALEBAR_ROWS, img.width, img.height))
        arr = resize_edge(img, self.oversize)
        x = arr.astype(np.float32) / 255.0 * 2.0 - 1.0
        t = self.target_size
        dy = int(g.integers(0, arr.shape[0] - t + 1))
        dx = int(g.integers(0, arr.shape[1] - t + 1))
        x = x[dy:dy + t, dx:dx + t]
        if g.integers(0, 2) == 0:
            x = x[::-1, :]  # vertical flip
        return np.ascontiguousarray(x)[..., None]


class ImageTransformTest:
    """Eval-time image transform (reference: src/data.py:93-107): same as
    train without the over-resize, random crop, or flip."""

    def __init__(self, target_size: int = 224) -> None:
        self.target_size = target_size

    def __call__(self, img: Image.Image,
                 rng: Optional[np.random.Generator] = None) -> np.ndarray:
        img = img.convert("L")
        img = img.crop((0, SCALEBAR_ROWS, img.width, img.height))
        arr = resize_edge(img, self.target_size)
        x = arr.astype(np.float32) / 255.0 * 2.0 - 1.0
        return x[..., None]


class ProfileTransform:
    """Raw profile transform (reference: src/data.py:110-121): log1p, then
    optional linear resample to ``max_len``."""

    def __init__(self, max_len: Optional[int] = None) -> None:
        self.max_len = max_len

    def __call__(self, profile: np.ndarray,
                 rng: Optional[np.random.Generator] = None) -> np.ndarray:
        profile = np.log1p(np.asarray(profile, dtype=np.float32))
        if self.max_len:
            profile = resample_linear(profile, self.max_len)
        return profile


class ProfileTransformTrain:
    """Train-time profile transform (reference: src/data.py:124-140):
    log1p -> divide by per-channel log ceilings -> scale to [-1, 1] ->
    resample to ceil(1.05 * target) -> random crop target -> add N(0, 1e-3)."""

    def __init__(self, target_size: int = 224,
                 ceilings: np.ndarray = PROFILE_LOG_CEILINGS) -> None:
        self.target_size = target_size
        self.oversize = math.ceil(1.05 * target_size)
        self.ceilings = np.asarray(ceilings, dtype=np.float32)

    def __call__(self, profile: np.ndarray,
                 rng: Optional[np.random.Generator] = None) -> np.ndarray:
        g = _rng(rng)
        x = np.log1p(np.asarray(profile, dtype=np.float32))
        d = x.shape[-1]
        x = x / self.ceilings[:d] * 2.0 - 1.0
        x = resample_linear(x, self.oversize)
        start = int(g.integers(0, self.oversize - self.target_size + 1))
        x = x[start:start + self.target_size]
        x = x + 1e-3 * g.standard_normal(x.shape).astype(np.float32)
        return x.astype(np.float32)


class ProfileTransformTest:
    """Eval-time profile transform (reference: src/data.py:143-157):
    deterministic resample to exactly ``target_size``."""

    def __init__(self, target_size: int = 224,
                 ceilings: np.ndarray = PROFILE_LOG_CEILINGS) -> None:
        self.target_size = target_size
        self.ceilings = np.asarray(ceilings, dtype=np.float32)

    def __call__(self, profile: np.ndarray,
                 rng: Optional[np.random.Generator] = None) -> np.ndarray:
        x = np.log1p(np.asarray(profile, dtype=np.float32))
        d = x.shape[-1]
        x = x / self.ceilings[:d] * 2.0 - 1.0
        x = resample_linear(x, self.target_size)
        return x.astype(np.float32)


class ImageTransformOversize:
    """Deterministic host-side prefix of the train image transform for the
    on-device augmentation path (ops/augment.py): crop the scale bar, resize
    to ceil(1.05 * target) with edge padding, rescale to [-1, 1]. The random
    crop / flips run batched on the TPU inside the train step."""

    def __init__(self, target_size: int = 224) -> None:
        self.oversize = math.ceil(1.05 * target_size)

    def __call__(self, img: Image.Image,
                 rng: Optional[np.random.Generator] = None) -> np.ndarray:
        img = img.convert("L")
        img = img.crop((0, SCALEBAR_ROWS, img.width, img.height))
        arr = resize_edge(img, self.oversize)
        return (arr.astype(np.float32) / 255.0 * 2.0 - 1.0)[..., None]


class ProfileTransformOversize:
    """Deterministic host-side prefix of the train profile transform for the
    on-device augmentation path: log1p, ceiling-normalize, [-1, 1], resample
    to ceil(1.05 * target). Random crop + noise run on the TPU."""

    def __init__(self, target_size: int = 224,
                 ceilings: np.ndarray = PROFILE_LOG_CEILINGS) -> None:
        self.oversize = math.ceil(1.05 * target_size)
        self.ceilings = np.asarray(ceilings, dtype=np.float32)

    def __call__(self, profile: np.ndarray,
                 rng: Optional[np.random.Generator] = None) -> np.ndarray:
        x = np.log1p(np.asarray(profile, dtype=np.float32))
        d = x.shape[-1]
        x = x / self.ceilings[:d] * 2.0 - 1.0
        return resample_linear(x, self.oversize).astype(np.float32)


class PairAugmentation:
    """Joint coin-flip: horizontal image flip AND time-reversal of the
    profile, keeping the modalities geometrically consistent
    (reference: src/data.py:198-204)."""

    def __call__(self, image: np.ndarray, profile: np.ndarray,
                 rng: Optional[np.random.Generator] = None
                 ) -> Tuple[np.ndarray, np.ndarray]:
        g = _rng(rng)
        if g.integers(0, 2) == 0:
            image = np.ascontiguousarray(image[:, ::-1])
            profile = np.ascontiguousarray(profile[::-1])
        return image, profile
