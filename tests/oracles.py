"""Pure-numpy reference implementations ("oracles") for DecNet-TPU ops.

These transliterate the *math* of the reference CUDA kernels
(/root/reference/modules/SparseMatching/src/SM_kernel.cu:22-355 and
/root/reference/modules/SparseVar/src/SV_kernel.cu:22-325) and selected torch
ops into straightforward numpy loops.  They are deliberately slow and simple —
they are the ground truth every JAX/Pallas implementation is tested against.

Layout convention: the TPU framework is NHWC; oracles take
  feats:  (B, H, W, C) float32
  masks:  (B, H, W)    float32 (0 = ignore, nonzero = active)
"""
from __future__ import annotations

import numpy as np

EPS = 1e-6  # matches the CUDA kernels' literal 0.000001


# ---------------------------------------------------------------------------
# Sparse matching (SpaMat) — SM_kernel.cu
# ---------------------------------------------------------------------------

def sparse_matching_fwd(ref, tar, ref_mask, tar_mask, max_disp):
    """Masked softargmin stereo matching. Returns (out, sum_sim, max_cost).

    Per left pixel (b,h,w) with ref_mask != 0 (SM_kernel.cu:76-125):
      d ranges over [0, min(max_disp, w+1)); right pixels with tar_mask==0 skip;
      cost(d) = <ref[b,h,w,:], tar[b,h,w-d,:]>
      max_cost = max(1e-6, max_d cost(d))                 (SM_kernel.cu:45)
      sum_sim  = 1e-6 + sum_d exp(cost-max_cost)          (SM_kernel.cu:100-119)
      out      = (1e-6 + sum_d exp(cost-max_cost)*d) / sum_sim
    Pixels with ref_mask == 0 keep out = sum_sim = max_cost = 0
    (zero-initialised outputs, functions/SpaMat.py:24-26).
    """
    B, H, W, C = ref.shape
    out = np.zeros((B, H, W), np.float32)
    sum_sim = np.zeros((B, H, W), np.float32)
    max_cost = np.zeros((B, H, W), np.float32)
    for b in range(B):
        for h in range(H):
            for w in range(W):
                if ref_mask[b, h, w] == 0:
                    continue
                cur_d = min(max_disp, w + 1)
                mc = EPS
                for d in range(cur_d):
                    if tar_mask[b, h, w - d] == 0:
                        continue
                    c = float(np.dot(ref[b, h, w], tar[b, h, w - d]))
                    mc = max(mc, c)
                ssim = EPS
                sdisp = EPS
                for d in range(cur_d):
                    if tar_mask[b, h, w - d] == 0:
                        continue
                    c = float(np.dot(ref[b, h, w], tar[b, h, w - d]))
                    e = np.exp(c - mc)
                    sdisp += e * d
                    ssim += e
                out[b, h, w] = sdisp / ssim
                sum_sim[b, h, w] = ssim
                max_cost[b, h, w] = mc
    return out, sum_sim, max_cost


def sparse_matching_bwd(ref, tar, ref_mask, tar_mask, out, sum_sim, max_cost,
                        grad_out, max_disp):
    """Analytic backward of sparse_matching_fwd. Returns (grad_ref, grad_tar).

    grad_ref (SM_kernel.cu:143-195): per (b,h,w,c) with ref_mask != 0,
      grad_ref = g/sum_sim * sum_d exp(cost-max)*tar[w-d,c]*(d-out)
    grad_tar (SM_kernel.cu:300-355): per (b,h,w,c) with tar_mask != 0, scans
      forward d in [0, min(max_disp, W-w)) over left pixels w+d with
      ref_mask != 0:
      grad_tar = sum_d g[w+d]*exp(cost-max[w+d])*ref[w+d,c]*(d-out[w+d])/sum_sim[w+d]
    """
    B, H, W, C = ref.shape
    grad_ref = np.zeros_like(ref)
    grad_tar = np.zeros_like(tar)
    for b in range(B):
        for h in range(H):
            for w in range(W):
                if ref_mask[b, h, w] != 0:
                    cur_d = min(max_disp, w + 1)
                    acc = np.zeros(C, np.float32)
                    for d in range(cur_d):
                        if tar_mask[b, h, w - d] == 0:
                            continue
                        c = float(np.dot(ref[b, h, w], tar[b, h, w - d]))
                        e = np.exp(c - max_cost[b, h, w])
                        acc += e * tar[b, h, w - d] * (d - out[b, h, w])
                    grad_ref[b, h, w] = grad_out[b, h, w] * acc / sum_sim[b, h, w]
                if tar_mask[b, h, w] != 0:
                    cur_d = min(max_disp, W - w)
                    acc = np.zeros(C, np.float32)
                    for d in range(cur_d):
                        wq = w + d
                        if ref_mask[b, h, wq] == 0:
                            continue
                        c = float(np.dot(ref[b, h, wq], tar[b, h, w]))
                        e = np.exp(c - max_cost[b, h, wq])
                        acc += (grad_out[b, h, wq] * e * ref[b, h, wq]
                                * (d - out[b, h, wq]) / sum_sim[b, h, wq])
                    grad_tar[b, h, w] = acc
    return grad_ref, grad_tar


# ---------------------------------------------------------------------------
# Sparse variance (SpaVar) — SV_kernel.cu
# ---------------------------------------------------------------------------

def sparse_var_fwd(ref, tar, ref_mask, tar_mask, disparity, max_disp):
    """Softmax-weighted variance around `disparity` (SV_kernel.cu:76-124).

    var = (1e-6 + sum_d exp(cost-max)*(d-disp)^2) / (1e-6 + sum_d exp(cost-max))
    Returns (var, sum_sim, max_cost)."""
    B, H, W, C = ref.shape
    out = np.zeros((B, H, W), np.float32)
    sum_sim = np.zeros((B, H, W), np.float32)
    max_cost = np.zeros((B, H, W), np.float32)
    for b in range(B):
        for h in range(H):
            for w in range(W):
                if ref_mask[b, h, w] == 0:
                    continue
                cur_d = min(max_disp, w + 1)
                mc = EPS
                for d in range(cur_d):
                    if tar_mask[b, h, w - d] == 0:
                        continue
                    c = float(np.dot(ref[b, h, w], tar[b, h, w - d]))
                    mc = max(mc, c)
                ssim = EPS
                svar = EPS
                dd = disparity[b, h, w]
                for d in range(cur_d):
                    if tar_mask[b, h, w - d] == 0:
                        continue
                    c = float(np.dot(ref[b, h, w], tar[b, h, w - d]))
                    e = np.exp(c - mc)
                    svar += e * (d - dd) ** 2
                    ssim += e
                out[b, h, w] = svar / ssim
                sum_sim[b, h, w] = ssim
                max_cost[b, h, w] = mc
    return out, sum_sim, max_cost


def sparse_var_bwd_feats(ref, tar, ref_mask, tar_mask, disparity, out,
                         sum_sim, max_cost, grad_out, max_disp):
    """SpaVar feature gradients (SV_kernel.cu:142-195 ref / :215-271 tar).

    grad_ref (ref_mask != 0):
      g/sum_sim * sum_d exp(cost-max)*tar[w-d,c]*((d-disp)^2 - out)
    grad_tar (tar_mask != 0), scanning d over left pixels w+d with
    ref_mask != 0:
      sum_d g[w+d]*exp(cost-max[w+d])*ref[w+d,c]
            *((d-disp[w+d])^2 - out[w+d])/sum_sim[w+d]
    """
    B, H, W, C = ref.shape
    grad_ref = np.zeros_like(ref)
    grad_tar = np.zeros_like(tar)
    for b in range(B):
        for h in range(H):
            for w in range(W):
                if ref_mask[b, h, w] != 0:
                    cur_d = min(max_disp, w + 1)
                    acc = np.zeros(C, np.float32)
                    dd = disparity[b, h, w]
                    for d in range(cur_d):
                        if tar_mask[b, h, w - d] == 0:
                            continue
                        c = float(np.dot(ref[b, h, w], tar[b, h, w - d]))
                        e = np.exp(c - max_cost[b, h, w])
                        acc += e * tar[b, h, w - d] * ((d - dd) ** 2
                                                       - out[b, h, w])
                    grad_ref[b, h, w] = (grad_out[b, h, w] * acc
                                         / sum_sim[b, h, w])
                if tar_mask[b, h, w] != 0:
                    cur_d = min(max_disp, W - w)
                    acc = np.zeros(C, np.float32)
                    for d in range(cur_d):
                        wq = w + d
                        if ref_mask[b, h, wq] == 0:
                            continue
                        c = float(np.dot(ref[b, h, wq], tar[b, h, w]))
                        e = np.exp(c - max_cost[b, h, wq])
                        acc += (grad_out[b, h, wq] * e * ref[b, h, wq]
                                * ((d - disparity[b, h, wq]) ** 2
                                   - out[b, h, wq]) / sum_sim[b, h, wq])
                    grad_tar[b, h, w] = acc
    return grad_ref, grad_tar


def sparse_var_grad_disp(ref, tar, ref_mask, tar_mask, disparity, sum_sim,
                         max_cost, grad_out, max_disp):
    """Gradient of sparse_var w.r.t. the input disparity (SV_kernel.cu:275-325).

    grad_disp = -2*g * sum_d exp(cost-max)*(d-disp) / sum_sim  where ref_mask != 0.
    """
    B, H, W, C = ref.shape
    gd = np.zeros((B, H, W), np.float32)
    for b in range(B):
        for h in range(H):
            for w in range(W):
                if ref_mask[b, h, w] == 0:
                    continue
                cur_d = min(max_disp, w + 1)
                acc = 0.0
                for d in range(cur_d):
                    if tar_mask[b, h, w - d] == 0:
                        continue
                    c = float(np.dot(ref[b, h, w], tar[b, h, w - d]))
                    e = np.exp(c - max_cost[b, h, w])
                    acc += e * (d - disparity[b, h, w])
                gd[b, h, w] = -2.0 * grad_out[b, h, w] * acc / sum_sim[b, h, w]
    return gd


# ---------------------------------------------------------------------------
# grid_sample parity (torch F.grid_sample, bilinear, zeros, align_corners=False)
# ---------------------------------------------------------------------------

def grid_sample_bilinear_zeros(img, grid):
    """img (B,H,W,C); grid (B,Ho,Wo,2) normalized xy in [-1,1].

    Torch semantics, align_corners=False: unnormalized x = ((gx+1)*W - 1)/2.
    Out-of-range taps contribute zero (padding_mode='zeros').
    Mirrors torch.nn.functional.grid_sample as used by the reference
    (modules/submodule.py:502, :742)."""
    B, H, W, C = img.shape
    _, Ho, Wo, _ = grid.shape
    out = np.zeros((B, Ho, Wo, C), np.float32)
    for b in range(B):
        for i in range(Ho):
            for j in range(Wo):
                gx, gy = grid[b, i, j]
                x = ((gx + 1) * W - 1) / 2.0
                y = ((gy + 1) * H - 1) / 2.0
                x0, y0 = int(np.floor(x)), int(np.floor(y))
                for dy in (0, 1):
                    for dx in (0, 1):
                        xi, yi = x0 + dx, y0 + dy
                        wgt = ((1 - abs(x - xi)) * (1 - abs(y - yi)))
                        if 0 <= xi < W and 0 <= yi < H and wgt > 0:
                            out[b, i, j] += wgt * img[b, yi, xi]
    return out


def warp_by_disparity(img, disp):
    """Right-view image sampled at x - disp, matching the reference's
    homography warp (submodule.py:479-510): normalized grid built with
    (W-1)/2 scaling then grid_sample(align_corners=False)."""
    B, H, W, C = img.shape
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    out = np.zeros((B, H, W, C), np.float32)
    for b in range(B):
        gx = (xs - disp[b]) / ((W - 1) / 2.0) - 1.0
        gy = ys / ((H - 1) / 2.0) - 1.0
        grid = np.stack([gx, gy], -1)[None]
        out[b] = grid_sample_bilinear_zeros(img[b:b + 1], grid)[0]
    return out


# ---------------------------------------------------------------------------
# Torch-parity resize (F.interpolate align_corners=False) for integer factors
# ---------------------------------------------------------------------------

def _cubic_kernel(x, a=-0.75):
    x = abs(float(x))
    if x <= 1:
        return (a + 2) * x ** 3 - (a + 3) * x ** 2 + 1
    if x < 2:
        return a * x ** 3 - 5 * a * x ** 2 + 8 * a * x - 4 * a
    return 0.0


def resize_1d_weights(in_size, out_size, mode):
    """Per-output-pixel (indices, weights) for torch F.interpolate with
    align_corners=False: src = (dst+0.5)*in/out - 0.5, edge-clamped taps."""
    scale = in_size / out_size
    taps = []
    for i in range(out_size):
        src = (i + 0.5) * scale - 0.5
        if mode == "bilinear":
            x0 = int(np.floor(src))
            idx = [x0, x0 + 1]
            wgt = [1 - (src - x0), src - x0]
        elif mode == "bicubic":
            x0 = int(np.floor(src))
            idx = [x0 - 1, x0, x0 + 1, x0 + 2]
            wgt = [_cubic_kernel(src - k) for k in idx]
        else:
            raise ValueError(mode)
        idx = [min(max(k, 0), in_size - 1) for k in idx]
        taps.append((idx, wgt))
    return taps


def interpolate(img, out_h, out_w, mode):
    """img (B,H,W,C) -> (B,out_h,out_w,C), torch F.interpolate parity
    (used for GT pyramid in loss.py:188-189 and skip-stage upsampling)."""
    B, H, W, C = img.shape
    ty = resize_1d_weights(H, out_h, mode)
    tx = resize_1d_weights(W, out_w, mode)
    tmp = np.zeros((B, out_h, W, C), np.float32)
    for i, (idx, wgt) in enumerate(ty):
        for k, g in zip(idx, wgt):
            tmp[:, i] += g * img[:, k]
    out = np.zeros((B, out_h, out_w, C), np.float32)
    for j, (idx, wgt) in enumerate(tx):
        for k, g in zip(idx, wgt):
            out[:, :, j] += g * tmp[:, :, k]
    return out


# ---------------------------------------------------------------------------
# Soft-argmin disparity regression (submodule.py:766-776)
# ---------------------------------------------------------------------------

def disparity_regression(cost, disp_samples):
    """cost (B,S,H,W), disp_samples (B,S,H,W) -> (B,H,W)."""
    c = cost - cost.max(axis=1, keepdims=True)
    p = np.exp(c)
    p = p / p.sum(axis=1, keepdims=True)
    return (p * disp_samples).sum(axis=1)
