"""Convolutions with a partitioner-safe kernel gradient.

XLA's SPMD partitioner (GSPMD and Shardy, jax 0.9.0 / jaxlib 0.9.0) emits the
conv *kernel-gradient* all-reduce over the FULL device set whenever (a) a
convolved spatial dim of the operands is sharded over one mesh axis and (b)
the mesh has another non-trivial axis the operands are replicated over.  The
replicated axis's shards each contribute a full copy, so kernel grads come
back multiplied by the idle-axis product (forward, data-grad and reduce-op
grads stay exact — see the minimal repro in
tests/test_parallel.py::test_conv_kernel_grad_idle_mesh_axis, HLO shows
``all-reduce ... replica_groups={{0,1,2,3}}`` where ``{{0,2},{1,3}}`` is
correct).

For DecNet's (data, tile, disp) mesh this hits every 2D conv (H sharded on
``tile``, replicated over ``disp``) and the stage-0 3D convs (S sharded on
``disp``, replicated over ``tile``) as soon as tile>1 and disp>1.

Workaround: a ``jax.custom_vjp`` conv that keeps the forward and the
data-gradient on the stock path (both are partitioned correctly) and computes
the kernel gradient as an explicit patches x cotangent contraction —
``dot_general`` partitioning derives the correct reduce groups from the
operand shardings.  Same FLOPs as the stock kernel-grad conv; the patches
tensor costs prod(filter) x activation memory in the backward, so the fixed
path is only engaged when the active mesh is in the buggy regime (trivially
true single-chip and for pure data/tile or data/disp meshes, where the stock
path is both correct and cheaper).  __graft_entry__.dryrun_multichip verifies
the sharded gradients numerically against a single-device replay every run.
"""
from __future__ import annotations

import functools
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _physical_mesh():
    """The mesh installed by a ``with mesh:`` context, or None."""
    try:
        from jax._src.mesh import thread_resources
        m = thread_resources.env.physical_mesh
        return None if m.empty else m
    except Exception:
        return None


def dk_fix_needed() -> bool:
    """True when tracing under a mesh where stock conv kernel-grads are wrong.

    The buggy regime needs a sharded convolved dim plus an idle non-trivial
    mesh axis.  On DecNet's (data, tile, disp) mesh that is exactly
    tile>1 and disp>1: 2D convs idle over disp, 3D convs idle over tile.
    data x tile and data x disp meshes leave no conv with an idle axis.
    """
    m = _physical_mesh()
    if m is None:
        return False
    sizes = dict(zip(m.axis_names, m.devices.shape))
    return sizes.get("tile", 1) > 1 and sizes.get("disp", 1) > 1


def _dn(nsp: int) -> Tuple[str, str, str]:
    if nsp == 2:
        return ("NHWC", "HWIO", "NHWC")
    assert nsp == 3, f"unsupported conv rank {nsp}"
    return ("NDHWC", "DHWIO", "NDHWC")


def _conv(x, k, strides, padding, lhs_dilation, rhs_dilation):
    return lax.conv_general_dilated(
        x, k, window_strides=strides, padding=padding,
        lhs_dilation=lhs_dilation, rhs_dilation=rhs_dilation,
        dimension_numbers=_dn(x.ndim - 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def conv_dk_fixed(x, k, strides, padding, lhs_dilation, rhs_dilation):
    """conv_general_dilated (NHWC/NDHWC, HWIO) with a partitioner-safe VJP."""
    return _conv(x, k, strides, padding, lhs_dilation, rhs_dilation)


def _fwd(x, k, strides, padding, lhs_dilation, rhs_dilation):
    y = _conv(x, k, strides, padding, lhs_dilation, rhs_dilation)
    return y, (x, k)


def _bwd(strides, padding, lhs_dilation, rhs_dilation, res, g):
    x, k = res
    # data grad: the stock transposed conv is partitioned correctly
    dx = jax.linear_transpose(
        lambda x_: _conv(x_, k, strides, padding, lhs_dilation, rhs_dilation),
        x)(g)[0]
    # kernel grad: explicit patches x cotangent contraction.
    # conv_general_dilated_patches extracts, with the SAME conv geometry, the
    # input window feeding each output position; its feature dim is
    # channel-major (c * prod(filter) + flat_filter_pos).
    nsp = x.ndim - 2
    fshape = tuple(k.shape[:nsp])
    cin, cout = k.shape[-2], k.shape[-1]
    patches = lax.conv_general_dilated_patches(
        x, filter_shape=fshape, window_strides=strides, padding=padding,
        lhs_dilation=lhs_dilation, rhs_dilation=rhs_dilation,
        dimension_numbers=_dn(nsp))           # (B, *out_spatial, cin*prod(f))
    # contract over batch + output-spatial: dot_general partitioning inserts
    # the all-reduce over exactly the axes those dims are sharded on
    dk_flat = jnp.einsum("...p,...o->po", patches, g,
                         preferred_element_type=jnp.float32)
    dk = dk_flat.reshape((cin,) + fshape + (cout,))
    dk = jnp.moveaxis(dk, 0, nsp)             # -> (*f, cin, cout)
    return dx.astype(x.dtype), dk.astype(k.dtype)


conv_dk_fixed.defvjp(_fwd, _bwd)


def conv_transpose_padding(k: int, s: int, padding: str) -> Tuple[int, int]:
    """Effective (lo, hi) padding of lax.conv_transpose for one dim
    (jax semantics: VALID pads so out = (in-1)*s + max(k, s); SAME so
    out = in*s)."""
    if padding == "SAME":
        pad_len = k + s - 2
        pad_a = k - 1 if s > k - 1 else int(np.ceil(pad_len / 2))
    elif padding == "VALID":
        pad_len = k + s - 2 + max(k - s, 0)
        pad_a = k - 1
    else:
        raise ValueError(padding)
    return (pad_a, pad_len - pad_a)
