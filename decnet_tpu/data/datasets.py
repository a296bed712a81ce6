"""Dataset readers for the four benchmark suites (reference loader/).

Each dataset yields a sample dict:
  left, right   (H,W,3) float32, ImageNet-normalised
  gt            (H,W)   float32 disparity (0 = invalid)
  left_masks / right_masks  [3] binary detail masks, coarsest (1/9) first
  ori_h, ori_w  ints (pre-padding size, for submission cropping)
  name          str
  n_disp        int per-scene disparity range

File formats (parity with the reference):
* SceneFlow  — fused .npy packs (H,W,7 = L rgb | R rgb | disparity)
               (SceneflowMask.py:115,144-146); optional sibling `<split>_mask`
               pickles with 6 masks [Lfull,L3,L9, Rfull,R3,R9]
               (SceneflowMask.py:167-191); otherwise masks are computed here.
* KITTI-2015 — same pack scheme, optional 8th object-mask channel
               (KITTI15Mask.py); `train_eval` split zeroes GT rows < 130.
* Middlebury — .pkl dicts {ndisp, im0, im1, disparity, disparity_right}
               (MiddleburyMask.py:116-122); per-scene ndisp drives max_disp.
* DrivingStereo — raw jpg/png dir triplets left-image/right-image/
               disparity-map (/256) (DrivingStereoMask.py:90-96).

Masks: computed with the native C++/cv2 pipeline when no precomputed pickle
exists (mask_source="compute"), matching utils/utils.py:483-534.
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np

from decnet_tpu.data import io as dio
from decnet_tpu.data import masks as dmasks
from decnet_tpu.data import augment


def _pad_topleft(arr: np.ndarray, interval: int) -> np.ndarray:
    h, w = arr.shape[:2]
    rh = (interval - h % interval) % interval
    rw = (interval - w % interval) % interval
    if rh == 0 and rw == 0:
        return arr
    pads = [(rh, 0), (rw, 0)] + [(0, 0)] * (arr.ndim - 2)
    return np.pad(arr, pads)


class StereoDataset:
    """Base: crop/pad, augmentation, normalisation, mask handling."""

    def __init__(self, root: str, split: str = "train", img_size=(540, 960),
                 scale: int = 3, levels: int = 3, is_training: bool = True,
                 mask_thold: float = 0.3, mask_source: str = "compute",
                 augment_cfg: Optional[dict] = None, seed: int = 0):
        self.root = root
        self.split = split
        self.img_size = img_size
        self.scale = scale
        self.levels = levels
        self.is_training = is_training
        self.mask_thold = mask_thold
        self.mask_source = mask_source
        self.augment_cfg = augment_cfg or {}
        self.interval = scale ** levels
        self.rng = np.random.RandomState(seed)
        self.default_ndisp = 192

    # -- subclass API ------------------------------------------------------
    def __len__(self):
        raise NotImplementedError

    def _load_raw(self, index: int) -> Dict:
        """Return dict(left, right, gt [0..255 floats], name, ndisp,
        optional masks6, optional gt_right)."""
        raise NotImplementedError

    # -- pipeline ----------------------------------------------------------
    def __getitem__(self, index: int) -> Dict:
        raw = self._load_raw(index)
        left, right, gt = raw["left"], raw["right"], raw["gt"]
        ori_h, ori_w = left.shape[:2]

        left = _pad_topleft(left, self.interval)
        right = _pad_topleft(right, self.interval)
        gt = _pad_topleft(gt, self.interval)
        masks6 = raw.get("masks6")
        if masks6 is not None:
            masks6 = [_pad_topleft(m, self.interval // self.scale ** (i % 3))
                      for i, m in enumerate(masks6)]

        if self.is_training:
            th = int(np.ceil(self.img_size[0] / self.interval) * self.interval)
            tw = int(np.ceil(self.img_size[1] / self.interval) * self.interval)
            h, w = left.shape[:2]
            if (th, tw) != (h, w):
                x1 = self.rng.randint(0, h - th + 1)
                y1 = self.rng.randint(0, w - tw + 1)
                # crops aligned to the pyramid (SceneflowMask.py:132-141)
                x1 = (x1 // self.interval) * self.interval
                y1 = (y1 // self.interval) * self.interval
                left = left[x1:x1 + th, y1:y1 + tw]
                right = right[x1:x1 + th, y1:y1 + tw]
                gt = gt[x1:x1 + th, y1:y1 + tw]
                if masks6 is not None:
                    masks6 = [m[x1 // self.scale ** (i % 3):(x1 + th) // self.scale ** (i % 3),
                                y1 // self.scale ** (i % 3):(y1 + tw) // self.scale ** (i % 3)]
                              for i, m in enumerate(masks6)]
            left, right = self._augment(left, right)

        if masks6 is not None:
            # pickle order [Lfull, L1/3, L1/9, Rfull, R1/3, R1/9] ->
            # coarsest-first lists (SceneflowMask.py:179-191)
            lmasks = [masks6[2], masks6[1], masks6[0]]
            rmasks = [masks6[5], masks6[4], masks6[3]]
        else:
            lmasks = dmasks.detail_masks_np(left / 255.0, self.scale,
                                            self.levels, self.mask_thold)
            rmasks = dmasks.detail_masks_np(right / 255.0, self.scale,
                                            self.levels, self.mask_thold)

        return {
            "left": dio.normalize_image(left / 255.0),
            "right": dio.normalize_image(right / 255.0),
            "gt": gt.astype(np.float32),
            "left_masks": [m.astype(np.float32) for m in lmasks],
            "right_masks": [m.astype(np.float32) for m in rmasks],
            "ori_h": ori_h, "ori_w": ori_w,
            "name": raw.get("name", str(index)),
            "n_disp": raw.get("ndisp", self.default_ndisp),
        }

    def _augment(self, left, right):
        cfg = self.augment_cfg
        if cfg.get("glare", True) and self.rng.binomial(1, 0.5):
            left, right = augment.add_parallax_glare(left, right, self.rng)
        if cfg.get("occlusion", False) and self.rng.binomial(1, 0.3):
            right = augment.random_occlusion_patch(right, self.rng)
        if cfg.get("photometric", False):
            left, right = augment.random_photometric(left, right, self.rng)
        return left, right


class SceneFlow(StereoDataset):
    def __init__(self, root, split="train", **kw):
        super().__init__(root, split, **kw)
        base = os.path.join(root, split)
        if not os.path.isdir(base):
            raise FileNotFoundError(base)
        self.files = sorted(os.path.join(base, f) for f in os.listdir(base)
                            if f.endswith(".npy"))
        self.mask_dir = base + "_mask"

    def __len__(self):
        return len(self.files)

    def _load_raw(self, index):
        pack = np.load(self.files[index]).astype(np.float32)
        name = os.path.splitext(os.path.basename(self.files[index]))[0]
        out = {"left": pack[..., 0:3], "right": pack[..., 3:6],
               "gt": pack[..., 6], "name": name, "ndisp": 192}
        mpath = os.path.join(self.mask_dir, name)
        if self.mask_source == "precomputed" and os.path.exists(mpath):
            with open(mpath, "rb") as f:
                out["masks6"] = [np.asarray(m, np.float32)
                                 for m in pickle.load(f)]
        return out


class Kitti2015(SceneFlow):
    """KITTI pack loader; `train_eval` split zeroes GT rows < 130
    (KITTI15Mask.py:164-165)."""

    def __init__(self, root, split="train", **kw):
        kw.setdefault("augment_cfg", {"glare": True, "occlusion": True,
                                      "photometric": True})
        super().__init__(root, split.replace("_eval", ""), **kw)
        self.zero_top = split.endswith("_eval") or not self.is_training

    def _load_raw(self, index):
        out = super()._load_raw(index)
        if self.zero_top:
            out["gt"] = out["gt"].copy()
            out["gt"][:130] = 0.0
        return out


class Middlebury(StereoDataset):
    def __init__(self, root, split="eval_F", **kw):
        kw.setdefault("is_training", split.startswith("train"))
        super().__init__(root, split, **kw)
        base = os.path.join(root, split)
        if not os.path.isdir(base):
            raise FileNotFoundError(base)
        self.files = sorted(os.path.join(base, f) for f in os.listdir(base)
                            if f.endswith(".pkl"))

    def __len__(self):
        return len(self.files)

    def _load_raw(self, index):
        with open(self.files[index], "rb") as f:
            d = pickle.load(f)
        name = os.path.splitext(os.path.basename(self.files[index]))[0]
        left = np.asarray(d["im0"], np.float32)
        right = np.asarray(d["im1"], np.float32)
        gt = np.nan_to_num(np.asarray(d["disparity"], np.float32),
                           posinf=0.0, neginf=0.0)
        out = {"left": left, "right": right, "gt": gt, "name": name,
               "ndisp": int(d.get("ndisp", 192))}
        if self.is_training and "disparity_right" in d \
                and self.rng.binomial(1, 0.5):
            gr = np.nan_to_num(np.asarray(d["disparity_right"], np.float32),
                               posinf=0.0, neginf=0.0)
            l, r, g = augment.horizontal_flip_stereo(left, right, gt, gr)
            out.update(left=l, right=r, gt=g)
        return out


class DrivingStereo(StereoDataset):
    """Raw directory triplets (DrivingStereoMask.py:90-96)."""

    def __init__(self, root, split="train", **kw):
        super().__init__(root, split, **kw)
        base = os.path.join(root, split)
        ldir = os.path.join(base, "left-image")
        self.left_files = sorted(
            os.path.join(ldir, f) for f in os.listdir(ldir))
        self.rdir = os.path.join(base, "right-image")
        self.ddir = os.path.join(base, "disparity-map")

    def __len__(self):
        return len(self.left_files)

    def _load_raw(self, index):
        lp = self.left_files[index]
        stem = os.path.splitext(os.path.basename(lp))[0]
        left = dio.read_image(lp).astype(np.float32)
        rp = os.path.join(self.rdir, os.path.basename(lp))
        right = dio.read_image(rp).astype(np.float32)
        dp = os.path.join(self.ddir, stem + ".png")
        gt = dio.read_disparity_png(dp)
        if not self.is_training:
            gt = gt.copy()
            gt[:130] = 0.0  # DrivingStereoMask.py:152-153
        return {"left": left, "right": right, "gt": gt, "name": stem,
                "ndisp": 192}


_DATASETS = {
    "sceneflow": SceneFlow, "sceneflowmask": SceneFlow,
    "kitti15": Kitti2015, "kitti15mask": Kitti2015,
    "middlebury": Middlebury, "middleburymask": Middlebury,
    "drivingstereo": DrivingStereo, "drivingstereomask": DrivingStereo,
}


def get_dataset(name: str, root: str, **kw) -> StereoDataset:
    key = name.lower()
    if key not in _DATASETS:
        raise KeyError(f"dataset {name} unknown; have {sorted(_DATASETS)}")
    return _DATASETS[key](root, **kw)
