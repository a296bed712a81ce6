"""Analytic FLOPs/pair of the reference DecNet (PyTorch) at the bench shape.

Builds the reference's actual torch modules (/root/reference/modules/
submodule.py — importable standalone; the full model class is not, since it
imports the compiled CUDA extensions) at the flagship configuration
(demo.sh:1: max_disp 216, base_channels 8, num_stage 4, down_scale 3, cor,
use_detail) and runs the model's forward data flow at the bench resolution
540x972 with conv-FLOP-counting hooks.  Non-conv ops (grid_sample warps, the
cor product, softmax/regression, the SpaMat/SpaVar masked scans) are counted
analytically and reported separately.

This anchors bench.py's `vs_baseline`: instead of a hand-waved reference
pairs/s, we publish the reference's REQUIRED FLOPs/pair next to ours and the
TFLOP/s we actually sustain (BASELINE.md "FLOPs anchor").

Usage: python scripts/ref_flops.py [--json runs/ref_flops.json]
"""
import sys, os, json, argparse
import importlib.util
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

# load submodule.py directly (the package __init__ imports torchvision,
# which is not in this image; submodule.py itself is standalone)
_spec = importlib.util.spec_from_file_location(
    "ref_submodule", "/root/reference/modules/submodule.py")
_sm = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_sm)
FeatExtNetChannelPlus = _sm.FeatExtNetChannelPlus
GetCostVolume = _sm.GetCostVolume
CostRegNetNoDown = _sm.CostRegNetNoDown
GenerateSparseMask = _sm.GenerateSparseMask
DynamicUpsampling = _sm.DynamicUpsampling
SoftAttention = _sm.SoftAttention
Refinement = _sm.Refinement
disparity_regression = _sm.disparity_regression

p = argparse.ArgumentParser()
p.add_argument("--h", type=int, default=540)
p.add_argument("--w", type=int, default=972)
p.add_argument("--max_disp", type=int, default=216)
p.add_argument("--base_channels", type=int, default=8)
p.add_argument("--densities", type=str, default="0.32,0.14,0.44",
               help="detail-mask densities at 1/9,1/3,1/1 (bench scenes)")
p.add_argument("--json", type=str, default=None)
args = p.parse_args()

H, W, D = args.h, args.w, args.max_disp
NS, SCALE = 4, 3
DENS = [float(x) for x in args.densities.split(",")]

conv_flops = [0]

def hook(mod, inp, out):
    if isinstance(mod, (nn.Conv2d, nn.Conv3d, nn.ConvTranspose2d,
                        nn.ConvTranspose3d)):
        k = int(np.prod(mod.kernel_size))
        cin = mod.in_channels // mod.groups
        if isinstance(mod, (nn.ConvTranspose2d, nn.ConvTranspose3d)):
            # transpose conv: MACs = in_numel * k * out_channels/groups
            n = inp[0].numel() * k * (mod.out_channels // mod.groups)
        else:
            n = out.numel() * k * cin
        conv_flops[0] += 2 * n

def instrument(m):
    for mod in m.modules():
        mod.register_forward_hook(hook)
    return m

torch.set_grad_enabled(False)

# --- modules at the flagship config (SparseDenseNetRefinementMask.py:64-91)
feat = instrument(FeatExtNetChannelPlus(base_channels=args.base_channels,
                                        num_stage=NS, down_scale=SCALE)).eval()
oc = feat.out_channels                      # [216, 72, 24, 8] coarse->fine
cost_vol = GetCostVolume(warp_ope="homgrp", cost_func="cor")
cost_reg = instrument(CostRegNetNoDown(in_channels=oc[0],
                                       base_channels=oc[0] * 2,
                                       cost_func="cor")).eval()
detail = [instrument(GenerateSparseMask(oc[i + 1], SCALE)).eval()
          for i in range(NS - 1)]
dyn_up = [instrument(DynamicUpsampling(oc[i + 1], SCALE)).eval()
          for i in range(NS - 1)]
soft_att = [instrument(SoftAttention(oc[i + 1] + 4, args.base_channels)).eval()
            for i in range(NS - 1)]
refine = [instrument(Refinement(oc[i + 1], args.base_channels // 2 ** i,
                                stage_id=i + 1)).eval()
          for i in range(NS - 1)]

analytic = {}

# --- feature extractor, both views (SparseDenseNetRefinementMask.py:103-104)
left = torch.zeros(1, 3, H, W)
fl = feat(left)
fr = feat(left)

# --- stage 0 dense pipeline at 1/27 (SparseDenseNetRefinementMask.py:127-140)
h0, w0, S = H // 27, W // 27, D // 27
l0, r0 = fl["stage0"], fr["stage0"]
samples = torch.arange(S, dtype=torch.float32).view(1, S, 1, 1) \
    .expand(1, S, h0, w0)
vol = cost_vol(l0, r0, disp_samples=samples)
# grid_sample gather: ~8 flops per warped-volume element; cor: 1 mult each
analytic["stage0_warp"] = 8 * vol.numel()
analytic["stage0_cor"] = vol.numel()
cost = cost_reg(vol)
analytic["stage0_softargmin"] = 7 * cost.numel()
pred = disparity_regression(F.softmax(cost, dim=1), samples)

# --- fine stages 1..3 (SparseDenseNetRefinementMask.py:148-207)
spamat_flops = 0.0
for i in range(NS - 1):
    s = 27 // SCALE ** (i + 1)
    hs, ws, Ds, Cs = H // s, W // s, D // s, oc[i + 1]
    lf, rf = fl[f"stage{i+1}"], fr[f"stage{i+1}"]
    # learned detail masks, both views (use_detail=1, demo.sh:1)
    detail[i](lf, fl[f"stage{i}"])
    detail[i](rf, fr[f"stage{i}"])
    dense = dyn_up[i](pred, lf)
    analytic[f"stage{i+1}_dynup_gather"] = 2 * 9 * SCALE ** 2 * pred.numel()
    # SpaMat + SpaVar masked scans (SM_kernel.cu:22-125, SV_kernel.cu:22-124):
    # two passes each over D candidates x C channels at every masked pixel
    px = DENS[i] * hs * ws
    spamat = 2 * (2 * Cs + 4) * Ds * px        # max pass + weighted pass
    spavar = 2 * (2 * Cs + 6) * Ds * px
    analytic[f"stage{i+1}_spamat"] = spamat + spavar
    spamat_flops += spamat + spavar
    soft_att[i](torch.zeros(1, Cs + 4, hs, ws))
    pred, _ = refine[i](lf, rf, dense)
    analytic[f"stage{i+1}_refine_warp"] = 8 * rf.numel()

total_conv = conv_flops[0]
total_analytic = float(sum(analytic.values()))
total = total_conv + total_analytic

out = {
    "shape": f"{H}x{W}", "max_disp": D, "base_channels": args.base_channels,
    "mask_densities": DENS,
    "conv_flops_G": round(total_conv / 1e9, 2),
    "analytic_flops_G": round(total_analytic / 1e9, 2),
    "spamat_spavar_flops_G": round(spamat_flops / 1e9, 2),
    "total_flops_per_pair_G": round(total / 1e9, 2),
    "per_term_G": {k: round(v / 1e9, 3) for k, v in analytic.items()},
}
print(json.dumps(out, indent=2))
if args.json:
    with open(args.json, "w") as f:
        json.dump(out, f, indent=2)
