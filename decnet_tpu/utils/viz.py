"""Visualisation helpers (reference utils/utils.py:16-143 show_imgs/show_dis).

Headless-friendly: figures are saved to files rather than shown; disparity
maps get a turbo colormap with a colourbar; error maps use signed coolwarm.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def show_imgs(img_list: Sequence[Union[np.ndarray, Tuple]],
              ncols: int = 3, save_path: Optional[str] = None,
              dpi: int = 110):
    """Grid display of images/maps. Entries are arrays or
    (array, title[, cmap]) tuples, mirroring the reference convention."""
    plt = _plt()
    items = []
    for it in img_list:
        if isinstance(it, tuple):
            arr = np.asarray(it[0])
            title = it[1] if len(it) > 1 else ""
            cmap = it[2] if len(it) > 2 else None
        else:
            arr, title, cmap = np.asarray(it), "", None
        items.append((arr, title, cmap))
    n = len(items)
    ncols = min(ncols, n)
    nrows = -(-n // ncols)
    fig, axes = plt.subplots(nrows, ncols,
                             figsize=(4.2 * ncols, 3.2 * nrows),
                             squeeze=False)
    for i, (arr, title, cmap) in enumerate(items):
        ax = axes[i // ncols][i % ncols]
        if arr.ndim == 2:
            im = ax.imshow(arr, cmap=cmap or "turbo")
            fig.colorbar(im, ax=ax, fraction=0.04)
        else:
            ax.imshow(np.clip(arr, 0, 1) if arr.dtype.kind == "f" else arr)
        ax.set_title(title, fontsize=9)
        ax.axis("off")
    for j in range(n, nrows * ncols):
        axes[j // ncols][j % ncols].axis("off")
    fig.tight_layout()
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path, dpi=dpi)
        plt.close(fig)
        return save_path
    return fig


def show_dist(charts: Sequence[Union[Tuple, dict]], ncols: int = 3,
              save_path: Optional[str] = None, dpi: int = 110):
    """Grid of bar charts (disparity histograms / per-stage statistics),
    the reference's show_dis (utils/utils.py:97-143). Entries are
    (x, y, title[, color]) tuples or {"x","y","title","color","points"}
    dicts, where points is an optional (px, py) scatter overlay."""
    plt = _plt()
    items = []
    for it in charts:
        if isinstance(it, dict):
            items.append(it)
        else:
            keys = ("x", "y", "title", "color")
            items.append(dict(zip(keys, it)))
    n = len(items)
    ncols = min(ncols, n)
    nrows = -(-n // ncols)
    fig, axes = plt.subplots(nrows, ncols,
                             figsize=(5.0 * ncols, 3.0 * nrows),
                             squeeze=False)
    for i, c in enumerate(items):
        ax = axes[i // ncols][i % ncols]
        ax.bar(np.asarray(c["x"]), np.asarray(c["y"]),
               color=c.get("color"))
        ax.set_title(c.get("title", ""), fontsize=9)
        if c.get("points") is not None:
            px, py = c["points"]
            ax.scatter(px, py, s=12, c="crimson", zorder=3)
    for j in range(n, nrows * ncols):
        axes[j // ncols][j % ncols].axis("off")
    fig.tight_layout()
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path, dpi=dpi)
        plt.close(fig)
        return save_path
    return fig


def disparity_histogram(disp: np.ndarray, max_disp: float, bins: int = 48):
    """(x, y) bar-chart data of a disparity map's valid-pixel distribution."""
    valid = disp[(disp > 0) & (disp < max_disp)]
    y, edges = np.histogram(valid, bins=bins, range=(0.0, float(max_disp)))
    return (edges[:-1] + edges[1:]) / 2.0, y


def save_disparity_png(path: str, disp: np.ndarray,
                       vmax: Optional[float] = None):
    """Colorised disparity visualisation (not the uint16 submission format)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(8, 5))
    im = ax.imshow(disp, cmap="turbo", vmin=0, vmax=vmax)
    fig.colorbar(im, ax=ax, fraction=0.04)
    ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def error_map(pred: np.ndarray, gt: np.ndarray, max_disp: float
              ) -> np.ndarray:
    """Signed error with invalid pixels zeroed, for show_imgs."""
    valid = (gt > 0) & (gt < max_disp)
    return np.where(valid, pred - gt, 0.0)
