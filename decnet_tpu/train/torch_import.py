"""Reference PyTorch checkpoint import.

Maps the reference model's state_dict (demo.py:124-135 loading convention:
`checkpoint['model_state']`, `module.` prefix stripped) onto the DecNet-TPU
flax variable tree so pretrained reference weights can drive numerical
cross-validation.

Layout conversions (validated numerically against torch in
tests/test_torch_import.py):
  Conv2d   weight (O,I,kh,kw)      -> flax kernel (kh,kw,I,O)
  Conv3d   weight (O,I,kd,kh,kw)   -> flax kernel (kd,kh,kw,I,O)
  ConvTranspose2d weight (I,O,kh,kw) -> flax ConvTranspose kernel
           (kh,kw,I,O) with transpose_kernel semantics handled by flipping
           spatial dims (flax ConvTranspose is a true transposed conv on a
           spatially-unflipped kernel).
  BatchNorm weight/bias -> params scale/bias; running_mean/var -> batch_stats.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def conv2d_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def conv3d_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 4, 1, 0))


def conv_transpose2d_kernel(w: np.ndarray) -> np.ndarray:
    # torch (I,O,kh,kw); flax ConvTranspose expects (kh,kw,I,O) and computes
    # the adjoint of a *correlation*, while torch's ConvTranspose2d is the
    # adjoint of torch's correlation conv => spatial flip needed.
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()


def _convunit_entries(tpath: str, fpath: Tuple[str, ...], kind: str = "conv2d"):
    """(torch_name, flax_path, converter, collection) entries for one
    Conv/Deconv unit (conv + optional BN)."""
    conv_kernel = {"conv2d": conv2d_kernel, "conv3d": conv3d_kernel,
                   "deconv2d": conv_transpose2d_kernel}[kind]
    conv_name = {"conv2d": "Conv_0", "conv3d": "Conv_0",
                 "deconv2d": "ConvTranspose_0"}[kind]
    out = [
        (f"{tpath}.conv.weight", fpath + (conv_name, "kernel"), conv_kernel,
         "params"),
        (f"{tpath}.conv.bias", fpath + (conv_name, "bias"), None, "params"),
        (f"{tpath}.bn.weight", fpath + ("BatchNorm_0", "scale"), None,
         "params"),
        (f"{tpath}.bn.bias", fpath + ("BatchNorm_0", "bias"), None, "params"),
        (f"{tpath}.bn.running_mean", fpath + ("BatchNorm_0", "mean"), None,
         "batch_stats"),
        (f"{tpath}.bn.running_var", fpath + ("BatchNorm_0", "var"), None,
         "batch_stats"),
    ]
    return out


def build_name_map(num_stage: int = 4) -> List:
    """Entries (torch_name, flax_path, converter, collection) for the shipped
    SparseDenseNetRefinementMask architecture."""
    E: List = []
    fe = "feature_extractor"

    def seq(tbase, names, kind="conv2d"):
        for i, n in enumerate(names):
            E.extend(_convunit_entries(f"{tbase}.{i}", (fe, n), kind))

    # encoder (submodule.py:255-304)
    seq(f"{fe}.conv0", ["conv0_0", "conv0_1"])
    seq(f"{fe}.conv1", ["conv1_0", "conv1_1", "conv1_2"])
    seq(f"{fe}.conv2", ["conv2_0", "conv2_1", "conv2_2"])
    E.extend(_convunit_entries(f"{fe}.conv3_1", (fe, "conv3_1")))
    seq(f"{fe}.conv3_2", ["conv3_2a", "conv3_2b"])
    for i in range(4):
        E.extend(_convunit_entries(
            f"{fe}.addition_ctx_collection.0.stages.c{i}",
            (fe, "aspp", f"c{i}")))
    E.extend(_convunit_entries(f"{fe}.addition_ctx_collection.1",
                               (fe, "ctx_fuse")))
    E.extend(_convunit_entries(f"{fe}.addition_fusion", (fe, "fusion")))
    for i in range(3):
        E.extend(_convunit_entries(f"{fe}.addition_trans{i}",
                                   (fe, f"trans{i}")))
    for d in (1, 2, 3):
        E.extend(_convunit_entries(f"{fe}.deconv{d}.deconv",
                                   (fe, f"deconv{d}", "deconv"), "deconv2d"))
        for j in range(2):
            E.extend(_convunit_entries(f"{fe}.deconv{d}.conv.{j}",
                                       (fe, f"deconv{d}", f"conv_{j}")))

    # cost regularizer (submodule.py:608-662)
    cr = "cost_reg"
    for j in range(2):
        E.extend(_convunit_entries(f"cost_regularizer.conv0.{j}",
                                   (cr, f"conv0_{j}"), "conv3d"))
    for j in range(3):
        E.extend(_convunit_entries(f"cost_regularizer.conv1.{j}",
                                   (cr, f"conv1_{j}"), "conv3d"))
    for j in range(3):
        E.extend(_convunit_entries(f"cost_regularizer.conv2.{j}",
                                   (cr, f"conv2_{j}"), "conv3d"))
    E.append(("cost_regularizer.conv_pre.weight", (cr, "conv_pre", "kernel"),
              conv3d_kernel, "params"))

    # per-fine-stage heads
    for i in range(num_stage - 1):
        dd = f"detail_{i}"
        E.extend(_convunit_entries(f"detail_detection.{i}.deconv.0",
                                   (dd, "deconv0"), "deconv2d"))
        E.extend(_convunit_entries(f"detail_detection.{i}.deconv.1",
                                   (dd, "deconv1")))
        E.extend(_convunit_entries(f"detail_detection.{i}.conv_sub.0",
                                   (dd, "sub0")))
        E.extend(_convunit_entries(f"detail_detection.{i}.conv_sub.1",
                                   (dd, "sub1")))
        E.extend(_convunit_entries(f"detail_detection.{i}.conv.0",
                                   (dd, "head0")))
        E.extend(_convunit_entries(f"detail_detection.{i}.conv.1",
                                   (dd, "head1")))
        for j in range(3):
            E.extend(_convunit_entries(
                f"dynamic_upsampling.{i}.weight_learning.{j}",
                (f"dyn_up_{i}", f"w{j}")))
            E.extend(_convunit_entries(f"soft_attention.{i}.conv.{j}",
                                       (f"soft_att_{i}", f"c{j}")))
        for j in range(7):
            E.extend(_convunit_entries(f"refinement.{i}.conv.{j}",
                                       (f"refine_{i}", f"c{j}")))
    return E


def convert_state_dict(state: Dict[str, np.ndarray], variables: Dict,
                       num_stage: int = 4, strict: bool = False) -> Dict:
    """Return a new variables tree with every matching torch tensor copied in.

    `state`: {name: ndarray} with `module.` prefixes already stripped.
    Reports (copied, missing_in_torch, unmatched_torch) via attributes on the
    returned dict under key '_import_report'.
    """
    import jax

    flat = {}
    for coll in ("params", "batch_stats"):
        leaves = jax.tree_util.tree_flatten_with_path(variables.get(coll, {}))[0]
        for path, v in leaves:
            key = tuple(getattr(p, "key", str(p)) for p in path)
            flat[(coll,) + key] = np.asarray(v)

    used = set()
    copied = 0
    missing = []
    for tname, fpath, conv, coll in build_name_map(num_stage):
        if tname not in state:
            continue
        key = (coll,) + tuple(fpath)
        if key not in flat:
            missing.append((tname, key))
            continue
        w = np.asarray(state[tname], np.float32)
        if conv is not None:
            w = conv(w)
        if w.shape != flat[key].shape:
            raise ValueError(f"shape mismatch {tname} {w.shape} -> "
                             f"{key} {flat[key].shape}")
        flat[key] = w
        used.add(tname)
        copied += 1
    unmatched = sorted(set(state) - used)
    if strict and (missing or unmatched):
        raise ValueError(f"import incomplete: missing={missing[:5]} "
                         f"unmatched={unmatched[:5]}")

    # rebuild nested tree
    def rebuild(coll):
        tree = {}
        for key, v in flat.items():
            if key[0] != coll:
                continue
            cur = tree
            for k in key[1:-1]:
                cur = cur.setdefault(k, {})
            cur[key[1:][-1]] = v
        return tree

    out = {"params": rebuild("params"), "batch_stats": rebuild("batch_stats")}
    out["_import_report"] = {"copied": copied, "missing": missing,
                             "unmatched": unmatched}
    return out


def load_reference_checkpoint(path: str, variables: Dict,
                              num_stage: int = 4) -> Dict:
    """torch.load a reference .pkl checkpoint and convert (demo.py:124-135)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model_state", ckpt)
    state = {k.replace("module.", ""): v.detach().numpy()
             for k, v in state.items()}
    return convert_state_dict(state, variables, num_stage)
