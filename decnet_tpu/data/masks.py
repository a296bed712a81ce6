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


_HAAR_NP = {
    "lh": np.array([[0.5, 0.5], [-0.5, -0.5]], np.float32),
    "hl": np.array([[0.5, -0.5], [0.5, -0.5]], np.float32),
    "hh": np.array([[0.5, -0.5], [-0.5, 0.5]], np.float32),
}


def _wavelet_level_energies(gray: np.ndarray, levels: int) -> List[np.ndarray]:
    """Per-level raw max-|HF| Haar energies of the running LL approximation
    (utils/Wavelet.py:66-95), finest first, unnormalised."""
    out = []
    for _ in range(levels):
        h, w = gray.shape
        if h % 2 or w % 2:   # odd dims: edge-replicate one row/col (same
            # convention as ops/detail.py::_haar_bands)
            gray = np.pad(gray, ((0, h % 2), (0, w % 2)), mode="edge")
            h, w = gray.shape
        x = gray.reshape(h // 2, 2, w // 2, 2)
        e = None
        for f in _HAAR_NP.values():
            band = np.abs(np.einsum("hiwj,ij->hw", x, f))
            e = band if e is None else np.maximum(e, band)
        gray = x.mean(axis=(1, 3))
        out.append(e)
    return out


def _decile_threshold(norms, target: float) -> float:
    """Smallest decile t with mean fraction of pixels <= t across the given
    normalised maps >= target (Wavelet.py:96-106's adaptive threshold)."""
    for t in np.arange(1, 11) / 10.0:
        if np.mean([(n <= t).mean() for n in norms]) >= target:
            return t
    return 1.0


def _to_stage_grid(mask: np.ndarray, gh: int, gw: int) -> np.ndarray:
    """Nearest-resample a wavelet-grid (H/2^i) mask onto its stage grid
    (H/scale^i) — wavelets halve per level, the model /scales."""
    if cv2 is not None:
        return cv2.resize(mask, (gw, gh), interpolation=cv2.INTER_NEAREST)
    yi = (np.arange(gh) * mask.shape[0] // gh)   # pragma: no cover
    xi = (np.arange(gw) * mask.shape[1] // gw)
    return mask[yi][:, xi]


def wavelet_detail_masks_np(img: np.ndarray, scale: int = 3, levels: int = 3,
                            target: float = 0.85) -> List[np.ndarray]:
    """Host-side twin of ops/detail.py::wavelet_detail_masks, resampled onto
    the model's stage grids — the paper's wavelet-based detail detection
    (utils/Wavelet.py:66-123; shipped broken upstream: the weights pickle is
    absent and no entry point calls it).

    Per level: one Haar analysis step on the running LL approximation, max
    |HF| over LH/HL/HH, per-image min-max normalise, binarise at the adaptive
    first-decile threshold covering >= `target` of pixels (Wavelet.py:96-106).
    img (H,W,C) float in [0,1]; returns masks coarsest-first
    ([1/scale^(levels-1), ..., full-res]) like detail_masks_np.

    NOTE: per-image thresholds are the reference's semantics but break
    stereo consistency — use `wavelet_pair_masks_np` for the pipeline (the
    sparse matcher skips right pixels outside the right mask, so the views
    must keep the same structures)."""
    H, W = img.shape[:2]
    energies = _wavelet_level_energies(img.astype(np.float32).mean(axis=2),
                                       levels)
    masks = []
    for lev, e in enumerate(energies, start=1):
        lo, hi = e.min(), e.max()
        norm = (e - lo) / max(hi - lo, 1e-12)
        mask = (norm >= _decile_threshold([norm], target)).astype(np.float32)
        # level-1 detail (finest HF) supervises the full-res stage, level-2
        # the 1/scale stage, ... — same coarsest-last order as the Gaussian
        # residual pyramid before the final reversal
        masks.append(_to_stage_grid(mask, H // scale ** (lev - 1),
                                    W // scale ** (lev - 1)))
    return masks[::-1]


def wavelet_pair_masks_np(left: np.ndarray, right: np.ndarray,
                          scale: int = 3, levels: int = 3,
                          target: float = 0.85, tar_dilate_cells: int = 1):
    """Stereo-consistent wavelet masks: `(left_masks, right_masks)`, each
    coarsest-first, with the min-max normalisation AND the adaptive decile
    threshold shared across the pair per level.

    Independent per-image thresholds (the reference's Wavelet.py:96-106 is
    strictly per-image) rescale the two views' energies differently, so a
    structure kept in the left mask was often cut from the right — and the
    sparse matcher skips right pixels with tar_mask==0 (SM_kernel.cu:90-99),
    collapsing cross-view candidate availability to ~0.5 (VERDICT r4 weak
    #4, runs/ab_mask_family_r4.json).  Sharing lo/hi and the threshold means
    equal physical contrast binarises identically in both views; only true
    appearance differences (occlusion, specularity) can now disagree.

    `tar_dilate_cells`: additionally dilate the RIGHT (target-view) masks
    horizontally by that many wavelet cells before resampling.  The stride-2
    Haar grid phase-aliases under odd disparities — a structure on one cell
    boundary in the left view straddles two cells in the right, splitting
    its energy below threshold — and the right mask is only a candidate
    gate for the matcher (SpaMat skips tar_mask==0, SM_kernel.cu:90-99):
    widening it costs nothing in output sparsity and recovers exactly the
    parity-aliased candidates."""
    H, W = left.shape[:2]
    eL = _wavelet_level_energies(left.astype(np.float32).mean(axis=2), levels)
    eR = _wavelet_level_energies(right.astype(np.float32).mean(axis=2), levels)
    lms, rms = [], []
    for lev, (el, er) in enumerate(zip(eL, eR), start=1):
        lo = min(el.min(), er.min())
        hi = max(el.max(), er.max())
        nl = (el - lo) / max(hi - lo, 1e-12)
        nr = (er - lo) / max(hi - lo, 1e-12)
        th = _decile_threshold([nl, nr], target)
        rmask = nr >= th
        for _ in range(tar_dilate_cells):
            rmask = rmask | np.pad(rmask, ((0, 0), (1, 0)))[:, :-1] \
                | np.pad(rmask, ((0, 0), (0, 1)))[:, 1:]
        gh, gw = H // scale ** (lev - 1), W // scale ** (lev - 1)
        lms.append(_to_stage_grid((nl >= th).astype(np.float32), gh, gw))
        rms.append(_to_stage_grid(rmask.astype(np.float32), gh, gw))
    return lms[::-1], rms[::-1]
