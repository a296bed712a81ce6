"""Host-side detail-mask precompute (reference utils/utils.py:392-534).

The reference precomputes 6 binary masks per stereo pair offline into pickle
side-files (`*_mask` dirs, SceneflowMask.py:167-170) and recomputes them with
cv2 for demo inputs (demo.py:161-162).  This module reproduces that pipeline
in numpy/cv2 for data loading; prefers the native C++ implementation
(native/libdecnet_native.so) when built, falls back to cv2, and matches the
on-device JAX version (decnet_tpu/ops/detail.py) used for online generation.
"""
from __future__ import annotations

from typing import List

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from decnet_tpu.data import native


def _gaussian_down(img: np.ndarray, scale: int) -> np.ndarray:
    blurred = cv2.GaussianBlur(img, (3, 3), 1)
    return cv2.resize(blurred, (img.shape[1] // scale, img.shape[0] // scale))


def _gaussian_up(img: np.ndarray, scale: int) -> np.ndarray:
    up = cv2.resize(img, (img.shape[1] * scale, img.shape[0] * scale))
    return cv2.GaussianBlur(up, (5, 5), 1)


def anisotropic_diffusion(img: np.ndarray, iterations: int = 10,
                          lamda: float = 0.1, sigma: float = 15.0
                          ) -> np.ndarray:
    """Perona-Malik-style edge-aware filter (reference utils/utils.py:393-441
    `diffusion`): per iteration add `lamda * Σ_dir grad_dir·exp(-grad_dir²/σ²)`
    over the 4-neighbourhood, with replicated edges.

    The reference offers this as an optional pre-filter before detail
    detection. Two upstream quirks are kept for parity: (a) the directional
    gradients are computed ONCE from the input and reused every iteration;
    (b) `grad_dir` carries the sign of (center − neighbour), so the update
    *sharpens* low-contrast texture while the Gaussian weight leaves strong
    edges untouched — an edge-aware sharpen rather than the blur the upstream
    docstring claims. Works on (H,W) or (H,W,C)."""
    if iterations == 0:
        return img
    x = img.astype(np.float32)
    pad_l = np.concatenate([x[:, :1], x], axis=1)
    pad_r = np.concatenate([x, x[:, -1:]], axis=1)
    pad_t = np.concatenate([x[:1], x], axis=0)
    pad_b = np.concatenate([x, x[-1:]], axis=0)
    left_grad = (pad_r - pad_l)[:, :-1]
    right_grad = (pad_l - pad_r)[:, 1:]
    top_grad = (pad_b - pad_t)[:-1]
    bottom_grad = (pad_t - pad_b)[1:]

    def g(grad):
        return grad * np.exp(-(grad ** 2) / (sigma ** 2))

    update = g(left_grad) + g(right_grad) + g(top_grad) + g(bottom_grad)
    for _ in range(iterations):
        x = x + lamda * update
    return x


def detail_masks_np(img: np.ndarray, scale: int = 3, levels: int = 3,
                    thold: float = 0.3,
                    diffusion_iters: int = 0) -> List[np.ndarray]:
    """img: (H,W,C) float in [0,1], H/W divisible by scale**levels.

    Returns masks coarsest-first ([1/scale^(levels-1), ..., full]), matching
    the model's mask_list[stage-1] indexing (demo.py:166-168 feeds
    detailDetection(...)[::-1]).
    """
    if diffusion_iters:
        img = anisotropic_diffusion(img, iterations=diffusion_iters)
    if native.available():
        return native.detail_masks(img, scale, levels, thold)
    data = img.astype(np.float32)
    residuals = []
    for _ in range(levels):
        down = _gaussian_down(data, scale)
        up = _gaussian_up(down, scale)
        if up.shape != data.shape:
            up = cv2.resize(up, (data.shape[1], data.shape[0]))
        residuals.append(np.abs(data - up).sum(axis=2))
        data = down
    masks = []
    for r in residuals:
        lo, hi = r.min(), r.max()
        norm = (r - lo) / max(hi - lo, 1e-12)
        masks.append((norm >= thold).astype(np.float32))
    return masks[::-1]


def stereo_pair_masks(left: np.ndarray, right: np.ndarray, scale: int = 3,
                      levels: int = 3, thold: float = 0.3):
    """(left_masks, right_masks), each coarsest-first."""
    return (detail_masks_np(left, scale, levels, thold),
            detail_masks_np(right, scale, levels, thold))
