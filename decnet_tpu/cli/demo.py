"""Folder-based inference CLI (reference demo.py parity).

For each scene directory under --root containing im0.png/im1.png (and an
optional calib.txt with ndisp): pad to x27, compute detail masks, run the
model, write `<scene>.png` uint16 submission maps (disp*256, bottom-right
crop) into --save2where.

Usage:
  python -m decnet_tpu.cli.demo --root InputData/Sceneflow \
      --save2where out/ [--resume ckpt_dir] [--max_disp 216] ...
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np

from decnet_tpu.utils.cache import enable_compilation_cache
from decnet_tpu.cli.common import add_config_args, apply_checkpoint_sidecar, \
    build_config, init_model_and_state
from decnet_tpu.data import io as dio
from decnet_tpu.data import masks as dmasks


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_config_args(p)
    p.add_argument("--root", type=str, required=True)
    p.add_argument("--save2where", type=str, required=True)
    p.add_argument("--mask_thold", type=float, default=0.3,
                   help="precomputed-mask threshold (demo.py:161)")
    p.add_argument("--mask_source", type=str, default="compute",
                   choices=("compute", "wavelet"),
                   help="online detail-mask family: Gaussian-residual "
                        "pyramid (utils.py:483-534) or wavelet "
                        "(utils/Wavelet.py:66-123)")
    p.add_argument("--dump_intermediates", type=int, default=0,
                   help="save a per-scene grid of stage outputs (the "
                        "reference's is_check notebook workflow, "
                        "SparseDenseNetRefinementMask.py:218-235)")
    p.add_argument("--exec_s2d", type=int, default=0,
                   help="run faithful (reference-form) weights through the "
                        "exact space-to-depth repack (models/repack.py): "
                        "same outputs, s2d throughput")
    args = p.parse_args(argv)

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    cfg = build_config(args)
    # architecture follows the checkpoint's config sidecar when present, but
    # CLI-provided model flags win over it (cli/common.py)
    cfg = apply_checkpoint_sidecar(cfg, args)
    skip_stage = cfg.model.skip_stage_id
    model, state, _ = init_model_and_state(cfg, args.resume,
                                           for_training=False)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if args.exec_s2d and not cfg.model.s2d_fine:
        from decnet_tpu.models.repack import s2d_exec
        model, variables = s2d_exec(variables, cfg.model)

    os.makedirs(args.save2where, exist_ok=True)

    # bucket compiled forwards by (H, W, max_disp)
    import functools

    want_all = bool(args.dump_intermediates)

    @functools.lru_cache(maxsize=8)
    def forward_for(max_disp):
        @jax.jit
        def fwd(variables, left, right, lm0, lm1, lm2, rm0, rm1, rm2):
            out = model.apply(variables, left, right,
                              [lm0, lm1, lm2], [rm0, rm1, rm2],
                              train=False, max_disp=max_disp,
                              skip_stage_id=skip_stage)
            if want_all:
                return out
            return out["preds"][-1]
        return fwd

    scenes = sorted(d for d in os.listdir(args.root)
                    if os.path.isdir(os.path.join(args.root, d)))
    for name in scenes:
        sdir = os.path.join(args.root, name)
        left = dio.read_image(os.path.join(sdir, "im0.png"))
        right = dio.read_image(os.path.join(sdir, "im1.png"))
        ori_h, ori_w = left.shape[:2]
        ndisp = dio.read_calib_ndisp(os.path.join(sdir, "calib.txt")) \
            or cfg.model.max_disp

        lp = dio.pad_to_multiple(left.astype(np.float32) / 255.0, 27)
        rp = dio.pad_to_multiple(right.astype(np.float32) / 255.0, 27)
        if args.mask_source == "wavelet":
            # pair-consistent thresholds (data/masks.py::wavelet_pair_masks_np)
            lmasks, rmasks = dmasks.wavelet_pair_masks_np(
                lp, rp, cfg.model.down_scale, cfg.model.num_stage - 1)
        else:
            mk = lambda im: dmasks.detail_masks_np(
                im, cfg.model.down_scale, cfg.model.num_stage - 1,
                args.mask_thold)
            lmasks, rmasks = mk(lp), mk(rp)
        ln = dio.normalize_image(lp)[None]
        rn = dio.normalize_image(rp)[None]

        fwd = forward_for(int(ndisp))
        t0 = time.perf_counter()
        result = fwd(variables, ln, rn, *[m[None] for m in lmasks],
                     *[m[None] for m in rmasks])
        result = jax.block_until_ready(result)
        dt = time.perf_counter() - t0
        if want_all:
            from decnet_tpu.utils.viz import show_imgs
            out = result
            pred = np.asarray(out["preds"][-1])[0]
            panels = [(np.asarray(p)[0], f"pred s{i}")
                      for i, p in enumerate(out["preds"])]
            panels += [(np.asarray(x)[0], f"{nm} s{i + 1}")
                       for nm in ("dense", "sparse", "fusion", "soft_mask",
                                  "var")
                       for i, x in enumerate(out[nm])]
            panels += [(np.asarray(m)[0], f"mask s{i + 1}", "gray")
                       for i, m in enumerate(out["masks_used"])]
            show_imgs(panels, ncols=4,
                      save_path=os.path.join(args.save2where,
                                             name + "_check.png"))
        else:
            pred = np.asarray(result)[0]
        dio.write_submission_png(os.path.join(args.save2where, name + ".png"),
                                 pred, ori_h, ori_w)
        print(f"{name}: {lp.shape[0]}x{lp.shape[1]} ndisp={ndisp} "
              f"cost time: {dt:.3f}s")

    print("The testing is completed:",
          time.strftime("%Y-%m-%d %H:%M:%S"))


if __name__ == "__main__":
    main()
