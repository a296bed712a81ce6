"""On-device synthetic stereo batch generator.

A jit-compiled counterpart of :mod:`decnet_tpu.data.synthetic` that builds the
whole training batch — textured left view, layered disparity with fine
structures, geometrically warped right view, ImageNet normalisation, and
Gaussian-residual detail masks — on the accelerator from a PRNG key.

Why it exists (beyond speed): the remote-TPU runtime of this environment
leaks ~the full transferred size of host memory on EVERY host->device
transfer (scripts/diag_leak.py phases B-E: ~11.3 MB/step at batch 8,
independent of sync, gc, or buffer reuse), which OOM-killed a 25k-step
training run at step 9600.  Generating batches on device makes the steady
-state training loop transfer ZERO bytes from the host, and gives an
infinite, never-repeating data stream (fresh fold_in key per step) instead
of a fixed-length memorisable set.

The scene recipe mirrors synthetic.make_pair (smooth multi-scale texture,
smooth disparity background, fronto-parallel boxes) and adds THIN STRUCTURES
(1-6 px bars) whose disparity detail is destroyed by 1/27 downsampling —
exactly the high-frequency content the decomposition model's sparse fine
stages must recover (the paper's motivating case; reference README.md:2).
"""
from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp

from decnet_tpu.ops.detail import detail_masks
from decnet_tpu.ops.resize import interpolate

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)


def _smooth_field(key, b, h, w, cells, lo, hi):
    """(B,h,w) bilinear upsample of a random (cells+1)^2 grid, in [lo,hi]."""
    g = jax.random.uniform(key, (b, cells + 1, cells + 1, 1), jnp.float32)
    v = interpolate(g, h, w, "bilinear")[..., 0]
    return lo + (hi - lo) * v


class _TexFn:
    """Procedural scene texture T(x), sampleable at fractional x.

    Both views sample the SAME function — left at x, right at x + d(x) — so
    they are geometrically exact and equally sharp (warping one view's
    *pixels* into the other smooths it by the interpolation kernel, which
    collapses its detail-mask density and makes matching asymmetric).

    Each component grid is pre-resized along H to full height (y is never
    resampled; disparity shifts only x) and kept at its native W resolution;
    sampling bilinearly interpolates along W at x * (gw-1)/(wd-1).

    The texture DOMAIN spans [0, wd) image-space columns with wd = w +
    max_disp: the right view samples x + d_r up to w-1+max_disp, and a
    domain that ends at w-1 would leave the right image's trailing band
    black.  That band's giant step edge used to dominate the detail mask's
    per-image min-max normalisation, collapsing right-mask density ~40x
    below the left's and starving the sparse-matching branch of candidates
    (SpaMat skips tar_mask==0 pixels, SM_kernel.cu:90-99).
    """

    def __init__(self, key, b, h, w, wd=None, gains=(120.0, 80.0, 130.0)):
        # fine-noise gain 130 (was 55): with surface-attached texture the
        # residual max is a step edge, and the min-max-normalised mask
        # keeps only residuals above 0.3*max — at gain 55 full-res density
        # collapsed to 0.04; at 130 it lands at ~0.2 (left) / 0.35 (right)
        # with exact-correspondence availability 0.61 (0.84 within +-1 px),
        # the reference's "realistic density" regime (docs/performance.md)
        # component W-resolutions: coarse colour, mid detail, pixel noise —
        # counts scale with the domain so feature SIZE is w-independent
        self.wd = wd = wd or w
        widths = (max(2, round(6 * wd / w)), max(2, round(25 * wd / w)),
                  2 * wd)
        self.grids = []
        self.gains = gains
        for i, (gw, gain) in enumerate(zip(widths, gains)):
            key, k = jax.random.split(key)
            gh = min(gw, 2 * h)
            g = jax.random.uniform(k, (b, gh, gw, 3), jnp.float32)
            # resize along H only (W stays at grid resolution)
            g = interpolate(g, h, gw, "bilinear")
            self.grids.append(g)

    def __call__(self, x):
        """x (B,h,w) fractional image-space coords -> (B,h,w,3) in [0,255]."""
        out = 0.0
        for g, gain in zip(self.grids, self.gains):
            gw = g.shape[2]
            gx = jnp.clip(x, 0.0, self.wd - 1.0) \
                * ((gw - 1.0) / (self.wd - 1.0))
            # clip BEFORE computing fx so the exact right edge interpolates
            # to g[gw-1] (x0=gw-2, fx=1) instead of snapping to g[gw-2] —
            # the snap put a sharp seam in the last column of every smooth
            # texture component, which dominated the detail-mask min-max
            # normalisation and collapsed mask density ~4x
            x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, gw - 2)
            fx = (gx - x0)[..., None]
            g0 = jnp.take_along_axis(g, x0[..., None], axis=2)
            g1 = jnp.take_along_axis(g, (x0 + 1)[..., None], axis=2)
            out = out + gain * (g0 * (1 - fx) + g1 * fx)
        return jnp.clip(out, 0, 255)


def _rect_overlay(key, disp, off, n, h_rng, w_rng, d_rng, max_disp, wd):
    """Overlay `n` fronto-parallel rectangles per sample (later wins).

    h_rng/w_rng are (lo, hi) fractions of H/W for the rectangle size; d_rng
    is the disparity range as a fraction of max_disp.  Each rectangle also
    paints a per-surface TEXTURE OFFSET into `off`: views sample the shared
    texture at x + off(x), so depth edges coincide with texture
    discontinuities in BOTH views.  Without this the left view is a
    continuous function of x (no appearance change at depth edges): its
    detail-residual max is texture-only while the right view's occlusion
    step edges run ~2x higher, and the reference's min-max-normalised mask
    (utils.py:504-533 semantics) collapses on the right view — which
    starved SpaMat of tar candidates.  Surface-attached texture is also
    what makes thin structures matchable at all (their interior otherwise
    looks exactly like the background's continuation)."""
    B, H, W = disp.shape
    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    for i in range(n):
        key, k1 = jax.random.split(key)
        u = jax.random.uniform(k1, (6, B), jnp.float32)
        bh = (h_rng[0] + (h_rng[1] - h_rng[0]) * u[0]) * H
        bw = (w_rng[0] + (w_rng[1] - w_rng[0]) * u[1]) * W
        y0 = u[2] * (H - bh)
        x0 = u[3] * (W - bw)
        d = (d_rng[0] + (d_rng[1] - d_rng[0]) * u[4]) * max_disp
        o = (0.05 + 0.9 * u[5]) * wd
        inside = ((ys >= y0[:, None, None]) & (ys < (y0 + bh)[:, None, None])
                  & (xs >= x0[:, None, None]) & (xs < (x0 + bw)[:, None, None]))
        disp = jnp.where(inside, d[:, None, None], disp)
        off = jnp.where(inside, o[:, None, None], off)
    return disp, off


def _right_view_disparity(disp, xs, w):
    """Right-view disparity map d_r with correct occlusion semantics.

    The r3/r4 generator solved d_r(u) = d_l(u + d_r(u)) by fixed-point
    iteration — which converges on piecewise-smooth fields but NEVER lands
    on thin structures (starting from the background value, the iterate
    samples background disparity and stays there), so 1-6 px bars simply
    did not exist in the right view: their "true match" was unrenderable,
    candidate availability at exactly the decomposition's target pixels was
    structurally zero, and the sparse branch could not possibly win there
    (r4's "true match not even a tar-mask candidate at 33% of detail
    pixels" was this bug, not a property of the scenes).

    Correct construction: every left pixel x with disparity d projects to
    right coordinate u = x - d; where several project to the same u the
    nearest (max d) wins — a 1D z-buffer, i.e. a scatter-max splat.  Pixels
    no left pixel projects to (disocclusions) keep the fixed-point value,
    which converges there to the background surface actually visible."""
    d_r = disp
    for _ in range(4):
        xc = jnp.clip(xs + d_r, 0.0, w - 1.0)
        x0 = jnp.clip(jnp.floor(xc).astype(jnp.int32), 0, w - 2)
        fx = xc - x0
        f0 = jnp.take_along_axis(disp, x0, axis=2)
        f1 = jnp.take_along_axis(disp, x0 + 1, axis=2)
        d_r = f0 * (1 - fx) + f1 * fx
    # z-buffer splat: scatter-max disp into round(x - d); out-of-frame
    # projections go to a dropped overflow bin
    u = jnp.round(xs - disp).astype(jnp.int32)
    u = jnp.where((u >= 0) & (u <= w - 1), u, w)
    splat = jnp.full(disp.shape[:2] + (w + 1,), -jnp.inf, disp.dtype)
    splat = splat.at[
        jnp.arange(disp.shape[0])[:, None, None],
        jnp.arange(disp.shape[1])[None, :, None], u].max(disp)[..., :w]
    # foreground splats override; elsewhere (background, disocclusion)
    # the smooth fixed point is the accurate sub-pixel solution
    return jnp.where(splat > d_r + 1.0, splat, d_r)


def _stressor_scene(k_tex, k_bg, k_bar, *, batch, h, w, max_disp, scale,
                    levels, thold, dtype):
    """Adversarial thin-structure stream — the configuration in which dense
    upsampling PROVABLY fails and full-band sparse matching is the only
    mechanism that can recover the disparity (VERDICT r4 missing #2: the
    paper's motivating case, thin structures + repetitive texture at
    disparity discontinuities, README.md:2).

    Construction:
    - background: smooth low disparity; texture = smooth coarse colour
      (matchable at 1/27 — stage 0 must still work) + a strictly PERIODIC
      sinusoid (period ~24 px, locally smooth so it stays below the detail
      threshold, globally repetitive so nothing in a local window
      disambiguates a large shift);
    - thin bars (1-2 dozen px wide at protocol scale, tall): disparity
      offset 0.3-0.7*max_disp ABOVE background — invisible at 1/27 (the
      coarse stage cannot see them), and the offset exceeds any refinement
      receptive field (dilations <= 9, submodule.py:697-716), so
      DynamicUpsampling(3x3 coarse gather) + Refinement(local residual)
      are STRUCTURALLY unable to recover them;
    - bar texture: distinctive high-gain noise (surface-attached), so the
      full-band matcher CAN identify the true correspondence.

    The only path from a bar pixel to its true disparity is cross-view
    correspondence over the full band — exactly SpaMat's job."""
    wd = w + max_disp
    disp = _smooth_field(k_bg, batch, h, w, 4,
                         0.08 * max_disp, 0.22 * max_disp)
    off = jnp.zeros_like(disp)
    # tall-narrow bars, large disparity offsets (later-drawn wins)
    disp, off = _rect_overlay(k_bar, disp, off, 6, (0.3, 0.8),
                              (0.004, 0.02), (0.55, 0.9), max_disp, wd)
    # a few short-wide bars (horizontal thin structures)
    disp, off = _rect_overlay(jax.random.fold_in(k_bar, 1), disp, off, 2,
                              (0.006, 0.02), (0.15, 0.45), (0.55, 0.9),
                              max_disp, wd)

    # foreground texture: coarse colour + distinctive mid/fine noise
    tex_fg = _TexFn(k_tex, batch, h, w, wd=wd, gains=(120.0, 80.0, 200.0))
    # background: SAME coarse colour component + analytic periodic sinusoid
    # (sharing grids keeps the coarse appearance continuous across the
    # scene; the sinusoid is an exact function of x - epipolar-consistent
    # by construction)
    k_ph = jax.random.fold_in(k_tex, 7)
    phases = jax.random.uniform(k_ph, (2, batch, 1, 1, 3), jnp.float32) \
        * (2 * jnp.pi)
    period = 24.0

    def bg_tex(x):
        coarse = tex_fg.grids[0]
        gw = coarse.shape[2]
        gx = jnp.clip(x, 0.0, wd - 1.0) * ((gw - 1.0) / (wd - 1.0))
        x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, gw - 2)
        fx = (gx - x0)[..., None]
        g0 = jnp.take_along_axis(coarse, x0[..., None], axis=2)
        g1 = jnp.take_along_axis(coarse, (x0 + 1)[..., None], axis=2)
        base = tex_fg.gains[0] * (g0 * (1 - fx) + g1 * fx)
        xx = x[..., None]
        wave = 45.0 * jnp.sin(2 * jnp.pi * xx / period + phases[0]) \
            + 25.0 * jnp.sin(2 * jnp.pi * xx / (period / 2.0) + phases[1])
        return jnp.clip(base + wave, 0, 255)

    xs = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, None, :],
                          disp.shape)
    d_r = _right_view_disparity(disp, xs, w)

    def view(x):
        xo = jnp.clip(jnp.round(x).astype(jnp.int32), 0, w - 1)
        o = jnp.take_along_axis(off, xo, axis=2)
        fg = tex_fg(jnp.mod(x + o, wd))
        return jnp.where((o > 0)[..., None], fg, bg_tex(x))

    left = view(xs)
    right = view(xs + d_r)

    lm = detail_masks(left / 255.0, scale, levels, thold)
    rm = detail_masks(right / 255.0, scale, levels, thold)

    def norm(img):
        x = (img / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        return x.astype(dtype)

    return {"left": norm(left), "right": norm(right),
            "gt": disp.astype(jnp.float32),
            "left_masks": [m.astype(jnp.float32) for m in lm],
            "right_masks": [m.astype(jnp.float32) for m in rm]}


@functools.partial(jax.jit, static_argnames=("batch", "h", "w", "max_disp",
                                             "scale", "levels", "dtype",
                                             "variant"))
def make_device_batch(key, *, batch: int, h: int, w: int, max_disp: int,
                      scale: int = 3, levels: int = 3, thold: float = 0.3,
                      dtype=jnp.float32, variant: str = "default") -> Dict:
    """Generate one fully on-device training batch.

    Returns the standard train-batch pytree: left/right (B,H,W,3) normalised
    in `dtype`, gt (B,H,W) f32, left_masks/right_masks lists of (B,h_s,w_s)
    f32 binary masks coarsest-first (resolutions H/scale^(levels-1)..H).

    variant="stressor" is the adversarial thin-structure stream (the paper's
    motivating case, reference README.md:2): see `_stressor_scene`.
    variant="legacy" keeps the r3/r4 fixed-point right-view renderer, which
    never drew thin structures into the right view (_right_view_disparity's
    docstring) — retained only to reproduce round-4 artifacts."""
    k_tex, k_bg, k_box, k_bar = jax.random.split(key, 4)
    wd = w + max_disp

    if variant == "stressor":
        return _stressor_scene(k_tex, k_bg, k_bar, batch=batch, h=h, w=w,
                               max_disp=max_disp, scale=scale, levels=levels,
                               thold=thold, dtype=dtype)

    # --- disparity: smooth background + boxes + thin bars (fine detail);
    # every rectangle also carries a per-surface texture offset (see
    # _rect_overlay) so depth edges have appearance in both views
    disp = _smooth_field(k_bg, batch, h, w, 4, 0.1 * max_disp, 0.45 * max_disp)
    off = jnp.zeros_like(disp)
    disp, off = _rect_overlay(k_box, disp, off, 3, (1 / 8, 1 / 3),
                              (1 / 8, 1 / 3), (0.5, 0.9), max_disp, wd)
    # thin structures: tall-narrow and short-wide bars 1-6 px thick whose
    # disparity is lost at 1/27 resolution — the decomposition's target case
    disp, off = _rect_overlay(k_bar, disp, off, 3, (0.25, 0.6),
                              (0.004, 0.025), (0.55, 0.95), max_disp, wd)
    disp, off = _rect_overlay(jax.random.fold_in(k_bar, 1), disp, off, 3,
                              (0.004, 0.04), (0.15, 0.5), (0.55, 0.95),
                              max_disp, wd)

    # --- views: sample the shared procedural texture; left at x, right at
    # x + d_right (exact epipolar geometry, equal sharpness in both views).
    # d_right comes from _right_view_disparity: fixed-point solution for the
    # piecewise-smooth surfaces plus a scatter-max z-buffer splat so thin
    # foreground structures actually appear in the right view ("legacy"
    # skips the splat — the r3/r4 bug).  The domain extends max_disp past
    # the left frame so the right view is fully textured (see _TexFn).
    tex = _TexFn(k_tex, batch, h, w, wd=wd)
    xs = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, None, :],
                          disp.shape)

    if variant == "legacy":
        def sample_w(f, x):
            xc = jnp.clip(x, 0.0, w - 1.0)
            x0 = jnp.clip(jnp.floor(xc).astype(jnp.int32), 0, w - 2)
            fx = xc - x0
            f0 = jnp.take_along_axis(f, x0, axis=2)
            f1 = jnp.take_along_axis(f, x0 + 1, axis=2)
            return f0 * (1 - fx) + f1 * fx

        d_r = disp
        for _ in range(4):
            d_r = sample_w(disp, xs + d_r)
    else:
        d_r = _right_view_disparity(disp, xs, w)

    def view(x):
        """Composite scene function: texture at x + surface offset(x),
        wrapped onto the domain (off is piecewise-constant per surface and
        sampled nearest so its depth edges stay crisp)."""
        xo = jnp.clip(jnp.round(x).astype(jnp.int32), 0, w - 1)
        o = jnp.take_along_axis(off, xo, axis=2)
        return tex(jnp.mod(x + o, wd))

    left = view(xs)
    right = view(xs + d_r)

    # --- detail masks on the [0,1] images (same op the demo CLI uses)
    lm = detail_masks(left / 255.0, scale, levels, thold)
    rm = detail_masks(right / 255.0, scale, levels, thold)

    def norm(img):
        x = (img / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        return x.astype(dtype)

    return {"left": norm(left), "right": norm(right),
            "gt": disp.astype(jnp.float32),
            "left_masks": [m.astype(jnp.float32) for m in lm],
            "right_masks": [m.astype(jnp.float32) for m in rm]}


def device_batch_stream(seed: int, *, batch: int, h: int, w: int,
                        max_disp: int, scale: int = 3, levels: int = 3,
                        thold: float = 0.3, dtype=jnp.float32,
                        start_step: int = 0, val: bool = False, mesh=None,
                        variant: str = "default"):
    """Infinite iterator of on-device batches; step-keyed so resume at step N
    regenerates the same stream.  `val=True` uses a disjoint key root.

    With `mesh`, every batch is generated directly INTO the mesh's batch
    sharding (out_shardings on the jitted generator): the data lands
    sharded across chips with no host involvement and no resharding copy —
    the multi-chip twin of the leak-free single-chip path."""
    root = jax.random.fold_in(jax.random.PRNGKey(seed), 1 if val else 0)
    kw = dict(batch=batch, h=h, w=w, max_disp=max_disp, scale=scale,
              levels=levels, thold=thold, dtype=dtype, variant=variant)
    if mesh is None:
        def gen(key):
            return make_device_batch(key, **kw)
    else:
        from decnet_tpu.parallel.mesh import batch_sharding
        shapes = jax.eval_shape(functools.partial(make_device_batch, **kw),
                                jax.random.PRNGKey(0))
        shardings = jax.tree_util.tree_map(
            lambda x: batch_sharding(mesh, x.ndim), shapes)
        # __wrapped__ = the un-jitted generator; re-jit once with the mesh's
        # output shardings so batches are born sharded
        gen = jax.jit(functools.partial(make_device_batch.__wrapped__, **kw),
                      out_shardings=shardings)
    step = start_step
    while True:
        yield gen(jax.random.fold_in(root, step))
        step += 1
