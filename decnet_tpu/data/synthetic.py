"""Synthetic random-stereogram dataset with exact ground-truth disparity.

Generates smooth random disparity fields over procedurally textured scenes and
warps the left view to produce a geometrically consistent right view.  Used
for training smoke tests, convergence checks, and benchmarking without
external data.  Registered as dataset name "synthetic".
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from decnet_tpu.data import io as dio
from decnet_tpu.data import masks as dmasks
from decnet_tpu.data.datasets import StereoDataset, _DATASETS


def _smooth_field(rng, h, w, cells=6, lo=0.0, hi=1.0):
    g = rng.rand(cells + 3, cells + 3)
    ys = np.linspace(0, cells - 1, h)
    xs = np.linspace(0, cells - 1, w)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[None, :]
    v = (g[y0][:, x0] * (1 - fy) * (1 - fx) + g[y0][:, x0 + 1] * (1 - fy) * fx
         + g[y0 + 1][:, x0] * fy * (1 - fx) + g[y0 + 1][:, x0 + 1] * fy * fx)
    return lo + (hi - lo) * v


def make_pair(rng: np.random.RandomState, h: int, w: int, max_disp: int
              ) -> Dict[str, np.ndarray]:
    """Returns dict(left, right (H,W,3) in [0,255], gt (H,W))."""
    # textured left view: multi-scale noise + smooth colour field
    left = np.zeros((h, w, 3), np.float32)
    for c in range(3):
        left[..., c] = (_smooth_field(rng, h, w, 5, 0.2, 0.8) * 120
                        + _smooth_field(rng, h, w, 24, 0, 1) * 80
                        + rng.rand(h, w) * 55)
    left = np.clip(left, 0, 255)

    # layered disparity: smooth background + a few fronto-parallel boxes
    disp = _smooth_field(rng, h, w, 4, 0.1 * max_disp, 0.45 * max_disp)
    for _ in range(rng.randint(2, 5)):
        bh = rng.randint(h // 8, h // 3)
        bw = rng.randint(w // 8, w // 3)
        y = rng.randint(0, h - bh)
        x = rng.randint(0, w - bw)
        disp[y:y + bh, x:x + bw] = rng.uniform(0.5, 0.9) * max_disp
    # thin structures (1-6 px bars): disparity detail destroyed by 1/27
    # downsampling, i.e. exactly what the sparse fine stages must recover
    # (mirrors data.device_synth.make_device_batch)
    for _ in range(3):
        bw = max(1, int(rng.uniform(0.004, 0.025) * w))
        bh = rng.randint(h // 4, int(h * 0.6))
        y = rng.randint(0, h - bh)
        x = rng.randint(0, w - bw)
        disp[y:y + bh, x:x + bw] = rng.uniform(0.55, 0.95) * max_disp
    for _ in range(3):
        bh = max(1, int(rng.uniform(0.004, 0.04) * h))
        bw = rng.randint(w // 6, w // 2)
        y = rng.randint(0, h - bh)
        x = rng.randint(0, w - bw)
        disp[y:y + bh, x:x + bw] = rng.uniform(0.55, 0.95) * max_disp
    disp = disp.astype(np.float32)

    # right view: inverse-warp left at x + d_right. Approximate right-view
    # disparity by resampling the left disparity (ok for smooth fields; box
    # edges create the realistic occlusion artifacts).
    xs = np.arange(w, dtype=np.float32)[None, :]
    right = np.zeros_like(left)
    src_x = xs + disp  # sample left at x + d
    x0 = np.floor(src_x).astype(int)
    fx = src_x - x0
    x0c = np.clip(x0, 0, w - 1)
    x1c = np.clip(x0 + 1, 0, w - 1)
    rows = np.arange(h)[:, None]
    for c in range(3):
        right[..., c] = (left[rows, x0c, c] * (1 - fx)
                         + left[rows, x1c, c] * fx)
    oob = (src_x > w - 1)
    right[oob] = 0.0
    return {"left": left, "right": right, "gt": disp}


class Synthetic(StereoDataset):
    def __init__(self, root: str = "", split: str = "train", length: int = 64,
                 max_disp: int = 192, **kw):
        kw.setdefault("augment_cfg", {"glare": False})
        super().__init__(root, split, **kw)
        self.length = length
        self.max_disp_gen = max_disp
        self.base_seed = {"train": 0, "val": 10_000,
                          "test": 20_000}.get(split, 0)

    def __len__(self):
        return self.length

    def _load_raw(self, index):
        rng = np.random.RandomState(self.base_seed + index)
        h = int(np.ceil(self.img_size[0] / self.interval) * self.interval)
        w = int(np.ceil(self.img_size[1] / self.interval) * self.interval)
        d = make_pair(rng, h, w, min(self.max_disp_gen, w // 2))
        d["name"] = f"syn{self.base_seed + index:06d}"
        d["ndisp"] = self.max_disp_gen
        return d


_DATASETS["synthetic"] = Synthetic
