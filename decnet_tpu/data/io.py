"""Image / disparity file IO: PFM, 16-bit PNG submission format, calib files.

Parity targets: utils/utils.py:281-327 (readPFM), demo.py:149-155 (calib.txt
ndisp), demo.py:191-198 (uint16 PNG = disp*256, bottom-right crop).
"""
from __future__ import annotations

import os
import re
from typing import Optional, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def read_pfm(path: str) -> Tuple[np.ndarray, float]:
    """Portable float map (SceneFlow disparity format)."""
    with open(path, "rb") as f:
        header = f.readline().rstrip().decode()
        if header == "PF":
            color = True
        elif header == "Pf":
            color = False
        else:
            raise ValueError(f"{path}: not a PFM file")
        dims = f.readline().decode()
        m = re.match(r"^(\d+)\s(\d+)\s*$", dims)
        if not m:
            raise ValueError(f"{path}: malformed PFM header")
        width, height = int(m.group(1)), int(m.group(2))
        scale = float(f.readline().rstrip().decode())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, endian + "f")
    shape = (height, width, 3) if color else (height, width)
    data = data.reshape(shape)
    return np.flipud(data).copy(), abs(scale)


def write_pfm(path: str, data: np.ndarray, scale: float = 1.0):
    data = np.asarray(data, np.float32)
    color = data.ndim == 3
    with open(path, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{data.shape[1]} {data.shape[0]}\n".encode())
        f.write(f"{-scale}\n".encode())  # little-endian
        np.flipud(data).astype("<f").tofile(f)


def read_image(path: str) -> np.ndarray:
    """RGB uint8 image."""
    if cv2 is not None:
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    from PIL import Image
    return np.asarray(Image.open(path).convert("RGB"))


def read_disparity_png(path: str, scale: float = 256.0) -> np.ndarray:
    """KITTI/DrivingStereo style uint16 disparity PNG (value/256)."""
    if cv2 is not None:
        d = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if d is None:
            raise FileNotFoundError(path)
    else:
        from PIL import Image
        d = np.asarray(Image.open(path))
    return d.astype(np.float32) / scale


def write_submission_png(path: str, disp: np.ndarray,
                         ori_h: Optional[int] = None,
                         ori_w: Optional[int] = None):
    """uint16 PNG = clip(disp*256, 0, 65535), cropped bottom-right to the
    original size (demo.py:191-198: padding was applied top-left)."""
    out = np.clip(disp * 256.0, 0, 65535).astype(np.uint16)
    if ori_h is not None:
        out = out[-ori_h:, -ori_w:]
    if cv2 is not None:
        cv2.imwrite(path, out)
    else:
        from PIL import Image
        Image.fromarray(out).save(path)


def read_calib_ndisp(path: str, align: int = 27) -> Optional[int]:
    """Per-scene disparity range from a Middlebury-style calib.txt: the last
    line is `ndisp=N`; rounded up to a multiple of `align` (demo.py:149-155).
    """
    if not os.path.exists(path):
        return None
    with open(path) as f:
        lines = f.readlines()
    n = float(lines[-1].strip().split("=")[-1])
    return int(np.ceil(n / align) * align)


def pad_to_multiple(img: np.ndarray, multiple: int = 27) -> np.ndarray:
    """Zero-pad top-left so H,W are multiples of `multiple` (demo.py:75-81)."""
    h, w = img.shape[:2]
    rh = int(np.ceil(h / multiple) * multiple) - h
    rw = int(np.ceil(w / multiple) * multiple) - w
    pads = [(rh, 0), (rw, 0)] + [(0, 0)] * (img.ndim - 2)
    return np.pad(img, pads)


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def normalize_image(img: np.ndarray) -> np.ndarray:
    """[0,1] RGB -> ImageNet-normalised float32 (demo.py:83-89)."""
    return ((img.astype(np.float32) - IMAGENET_MEAN) / IMAGENET_STD)
