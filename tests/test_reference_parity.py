"""End-to-end forward parity against the actual reference implementation.

Imports the PyTorch reference model (/root/reference/modules/
SparseDenseNetRefinementMask.py) on CPU with its CUDA extensions replaced by
in-place stubs that call this repo's numpy oracles (tests/oracles.py), runs a
full 4-stage forward with random weights, imports those weights through
decnet_tpu.train.torch_import, and checks the JAX model produces the same
disparity map.  This validates the whole stack at once: feature pyramid, cost
volume + regularizer, soft-argmin, dynamic upsampling, sparse matching +
variance, soft attention, fusion, refinement, and the checkpoint converter.

Skipped when /root/reference is not present.
"""
from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

from tests import oracles  # noqa: E402

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "modules")),
                                reason="reference repo not mounted")


def _nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1).astype(np.float32)


def _install_cuda_stubs():
    """Register fake `modules.*.build.lib` packages whose SpaMat/SpaVar call
    the numpy oracles (in-place fill, mirroring SM_cuda.cpp:29-35)."""

    def spamat_forward(ref, tar, rmask, tmask, out, ssim, mcost, max_disp):
        o, s, m = oracles.sparse_matching_fwd(
            _nhwc(ref), _nhwc(tar), rmask.detach().numpy(),
            tmask.detach().numpy(), int(max_disp))
        out.copy_(torch.from_numpy(o))
        ssim.copy_(torch.from_numpy(s))
        mcost.copy_(torch.from_numpy(m))

    def spavar_forward(ref, tar, rmask, tmask, disp, out, ssim, mcost,
                       max_disp):
        o, s, m = oracles.sparse_var_fwd(
            _nhwc(ref), _nhwc(tar), rmask.detach().numpy(),
            tmask.detach().numpy(), disp.detach().numpy(), int(max_disp))
        out.copy_(torch.from_numpy(o))
        ssim.copy_(torch.from_numpy(s))
        mcost.copy_(torch.from_numpy(m))

    if "torchvision" not in sys.modules:
        # modules/__init__.py:1 imports torchvision.models but never uses it
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models

    for pkg, fname, fn in (("SparseMatching", "SpaMat", spamat_forward),
                           ("SparseVar", "SpaVar", spavar_forward)):
        build = types.ModuleType(f"modules.{pkg}.build")
        lib = types.ModuleType(f"modules.{pkg}.build.lib")
        ext = types.SimpleNamespace(**{
            f"{'sparse_matching' if fname == 'SpaMat' else 'sparse_var'}"
            f"_cuda_forward": fn})
        setattr(lib, fname, ext)
        build.lib = lib
        sys.modules[f"modules.{pkg}.build"] = build
        sys.modules[f"modules.{pkg}.build.lib"] = lib


@pytest.fixture(scope="module")
def reference_modules():
    sys.path.insert(0, REF)
    _install_cuda_stubs()
    import modules as ref_modules  # noqa: F401  (the reference package)
    yield ref_modules
    sys.path.remove(REF)


def _build_reference(ref_modules, use_detail: bool):
    torch.manual_seed(7)
    model = ref_modules.get_model(
        name="sparsedensenetrefinementmask", max_disp=54, base_channels=4,
        cost_func="cor", grad_method="detach", num_stage=4, down_scale=3,
        step=[-1, 1, 1, 1], samp_num=[-1, 2, 2, 2],
        sample_spa_size_list=[-1, 3, 5, 7], down_func_name="bicubic",
        weights=[1.0, 1.0, 1.0, 1.0], if_overmask=False, skip_stage_id=4,
        use_detail=use_detail, thold=0.9)
    # randomize BN running stats so the batch_stats import path is exercised
    g = torch.Generator().manual_seed(11)
    for m in model.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
            m.running_mean.copy_(
                torch.randn(m.running_mean.shape, generator=g) * 0.05)
            m.running_var.copy_(
                torch.rand(m.running_var.shape, generator=g) * 0.5 + 0.75)
    model.eval()
    return model


def _jax_model(use_detail: bool):
    from decnet_tpu.config import ModelConfig
    from decnet_tpu.models import get_model
    cfg = ModelConfig(max_disp=54, base_channels=4, num_stage=4, down_scale=3,
                      cost_func="cor", grad_method="detach",
                      use_detail=use_detail, thold=0.9, skip_stage_id=4,
                      dtype="float32", matching_impl="xla", s2d_fine=False)
    return get_model("decnet", cfg)


def _random_inputs(seed=3):
    rng = np.random.RandomState(seed)
    B, H, W = 1, 54, 54
    left = rng.randn(B, H, W, 3).astype(np.float32) * 0.4
    right = rng.randn(B, H, W, 3).astype(np.float32) * 0.4
    masks = {}
    for s, (h, w) in enumerate([(H // 9, W // 9), (H // 3, W // 3), (H, W)]):
        masks[s] = ((rng.rand(B, h, w) < 0.35).astype(np.float32),
                    (rng.rand(B, h, w) < 0.35).astype(np.float32))
    return left, right, masks


def _run_reference(model, left, right, masks):
    tl = torch.from_numpy(left.transpose(0, 3, 1, 2)).contiguous()
    tr = torch.from_numpy(right.transpose(0, 3, 1, 2)).contiguous()
    lm = [torch.from_numpy(masks[s][0]).contiguous() for s in range(3)]
    rm = [torch.from_numpy(masks[s][1]).contiguous() for s in range(3)]
    disp0 = torch.zeros(left.shape[0], left.shape[1], left.shape[2])
    with torch.no_grad():
        preds = model(tl, tr, disp0, lm, rm, is_check=False, is_eval=False)
    return preds[-1].numpy()


def _run_ours(use_detail, tstate, left, right, masks):
    from decnet_tpu.train.torch_import import convert_state_dict
    model = _jax_model(use_detail)
    lm = [jnp.asarray(masks[s][0]) for s in range(3)]
    rm = [jnp.asarray(masks[s][1]) for s in range(3)]
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 54, 54, 3)), jnp.zeros((1, 54, 54, 3)),
                           left_masks=lm, right_masks=rm)
    conv = convert_state_dict(tstate, variables, num_stage=4)
    report = conv.pop("_import_report")
    assert report["copied"] > 0 and not report["missing"], report
    assert not report["unmatched"], f"unconverted torch keys: " \
                                    f"{report['unmatched'][:8]}"
    out = model.apply(conv, jnp.asarray(left), jnp.asarray(right),
                      left_masks=lm, right_masks=rm, train=False)
    return np.asarray(out["preds"][-1]), out


@pytest.mark.parametrize("use_detail", [False, True])
def test_full_model_forward_matches_reference(reference_modules, use_detail):
    left, right, masks = _random_inputs()
    ref_model = _build_reference(reference_modules, use_detail)
    state = {k: v.detach().numpy()
             for k, v in ref_model.state_dict().items()
             if "num_batches_tracked" not in k
             # the reference builds detail_detection unconditionally
             # (SparseDenseNetRefinementMask.py:72-75); our model only
             # instantiates the heads when use_detail=True
             and (use_detail or not k.startswith("detail_detection."))}
    ref_pred = _run_reference(ref_model, left, right, masks)
    our_pred, _ = _run_ours(use_detail, state, left, right, masks)

    assert our_pred.shape == ref_pred.shape
    diff = np.abs(our_pred - ref_pred)
    assert np.isfinite(our_pred).all()
    # full-res disparity values are O(1..50); demand sub-centipixel agreement
    assert diff.max() < 5e-2, (diff.max(), diff.mean())
    assert diff.mean() < 5e-3, (diff.max(), diff.mean())
