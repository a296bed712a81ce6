"""Configuration system for DecNet-TPU.

The reference scatters ~25 argparse flags across demo.py/eval.py plus a
config.json of dataset roots; canonical values live in demo.sh/eval.sh.  Here
everything is a typed dataclass, serialisable to/from JSON/YAML, with the
shipped reference configuration as defaults (demo.sh:1, eval.sh:1).
"""
from __future__ import annotations

import dataclasses
import json
from typing import List, Optional, Tuple

try:
    import yaml
except Exception:  # pragma: no cover
    yaml = None


@dataclasses.dataclass
class ModelConfig:
    """Architecture hyper-parameters (reference
    SparseDenseNetRefinementMask.__init__, :17-62)."""
    arch: str = "decnet"
    max_disp: int = 216
    base_channels: int = 8
    num_stage: int = 4
    down_scale: int = 3
    cost_func: str = "cor"              # cor | cat | ssd
    grad_method: str = "detach"         # detach | undetach
    skip_stage_id: int = 4              # stages >= this use plain upsampling
    use_detail: bool = True             # learned detail masks
    thold: float = 0.9                  # detail binarisation threshold
    # How the learned detail probabilities become binary masks.
    # "fixed": detail > thold — the reference semantics
    # (SparseDenseNetRefinementMask.py:163-170).  Brittle: the head's
    # sigmoids can saturate to either side of any fixed threshold (r4: mask
    # density 0.000 at thold 0.9 and ~1.0 at 0.5 on the SAME checkpoint).
    # "quantile": per-image adaptive threshold keeping the top
    # `detail_density` fraction of pixels — the reference's own
    # adaptive-threshold idea (utils/Wavelet.py:96-106) applied to the
    # learned heads; mask density is then calibrated by construction.
    thold_mode: str = "fixed"           # fixed | quantile
    detail_density: float = 0.25        # target mask density (quantile mode)
    # adaptive-sampling knobs (exposed by the reference CLI, eval.sh:1)
    step: Tuple[float, ...] = (-1, 1, 1, 1)
    samp_num: Tuple[int, ...] = (-1, 12, 10, 6)
    sample_spa_size_list: Tuple[int, ...] = (-1, 3, 5, 7)
    dtype: str = "bfloat16"             # compute dtype (params stay f32)
    matching_impl: str = "auto"         # auto | pallas | xla
    # Normalisation for every conv unit: "bn" (reference behaviour, sync
    # batch stats) or "gn" (GroupNorm, 8 ch/group — no batch statistics, so
    # no train/eval normalisation gap; the BN-gap root-cause ablation).
    norm: str = "bn"
    # Run the full-resolution stage in space-to-depth form (1/3-res x 72ch):
    # full-res C=8 convs waste ~16x HBM bandwidth on TPU lane padding. Same
    # function class, different parameterisation — a TPU-first variant, not
    # numerically identical to the reference layers.
    s2d_fine: bool = False
    # How many trailing fine stages run in s2d form when s2d_fine is set.
    # 1 = full-res stage only (the round-2 variant); 2 additionally runs the
    # 1/3-res stage's heads at 1/9 with 9x channels (soft-att hidden C=8 and
    # refine C=24/12 convs at 1/3 res are 5-16x lane-padded otherwise).
    s2d_stages: int = 1
    # Matching-score temperature: the kernels score candidates by a raw
    # feature dot product (SM_kernel.cu:94); with BN-pinned ~O(1) features the
    # softargmin over a 216-wide band is diffuse, so the expectation washes
    # out on multimodal texture.  match_temp scales the scores (implemented
    # as a scale on the ref features — kernels unchanged); when
    # match_temp_learned, a per-fine-stage log-temperature parameter is
    # trained instead (initialised at log(match_temp)).  1.0 + False =
    # exact reference semantics.
    match_temp: float = 1.0
    match_temp_learned: bool = False
    # Prior-windowed sparse matching: restrict each fine stage's scan to
    # |d - dense| <= match_window/down_size (full-res pixel units; the
    # per-stage window floors at 2).  The reference scans the FULL band
    # (SM_kernel.cu:86-88) — global correspondence with C<=8 descriptors,
    # which is unidentifiable on repetitive texture; the decomposition
    # already carries a coarse prior (the upsampled dense disparity), and
    # windowing the sparse scan around it is the reference's own
    # adaptive-sampling idea (submodule.py:398-411) applied to SpaMat.
    # 0 = reference semantics (full band).
    match_window: int = 0
    # Execution strategy for the stage-0 3x3x3 cost-regulariser convs
    # (~46% of model FLOPs): "xla3d" stock lowering, or "shift2d" — the 3D
    # conv decomposed into kernel-depth 2D convs over S-shifted slices with
    # S folded into batch (identical math and parameters; layers.py
    # _conv3d_shift2d).  A/B-measured on chip (scripts/ab_stage0.py).
    conv3d_impl: str = "xla3d"
    # Head-input concats (soft-attention / refinement / dynamic-upsampling
    # first convs) as PConv split-kernel tuples instead of materialised
    # jnp.concatenate (identical parameters; layers.py maybe_concat).
    split_concat: bool = False
    # Candidate fallback: left mask pixels whose entire disparity band is
    # masked out in the right view output the eps-sentinel 1.0
    # (SM_kernel.cu:45,:100-124) — garbage the attention fusion must learn
    # to reject.  With cand_fallback the sparse branch substitutes the dense
    # branch's value at exactly those pixels (ops/matching.py::
    # candidate_availability), so fusion can trust it everywhere it fires.
    # False = exact reference semantics.
    cand_fallback: bool = False

    def __post_init__(self):
        assert self.max_disp % (self.down_scale ** (self.num_stage - 1)) == 0, (
            f"max_disp({self.max_disp}) must be divisible by "
            f"down_scale^{self.num_stage - 1}")
        assert self.cost_func in ("cor", "cat", "ssd")
        assert self.num_stage <= 4


@dataclasses.dataclass
class LossConfig:
    loss_type: str = "multi_stage_regression_uploss"
    weights: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    down_func_name: str = "bicubic"     # GT pyramid: bilinear|bicubic|max|min
    if_overmask: bool = False           # mask sky rows (<108/down) for KITTI
    alpha: float = 0.1                  # detail-mask loss weight
    # Multiplier on the sparse-matching term's reference coefficient
    # 0.2/(10+3.75*stage) (loss.py:226-239). 1.0 = reference parity; the
    # coefficient is so small (~0.01) that from-scratch runs at <100k steps
    # never shape the features for matching — training recipes (which the
    # reference never shipped) may raise it.
    sparse_term_scale: float = 1.0
    # multi_stage_regression_upmaskloss eval mode (loss.py:343-345): binarise
    # the predicted detail maps at this threshold before scoring them against
    # the precomputed masks. None = train mode (soft predictions).
    binary_thold: Optional[float] = None
    # Restrict the sparse supervision term to mask pixels that actually have
    # a candidate in the right view (the no-candidate sentinel pixels carry
    # zero gradient but inflate the masked mean's denominator, diluting the
    # signal ~1/3 at Gaussian-residual mask densities).  Applies when the
    # model emits its `cand` maps; the reference masks by left_mask only
    # (loss.py:218-227).
    sparse_cand_mask: bool = True


@dataclasses.dataclass
class TrainConfig:
    lr: float = 1e-3
    lr_schedule: str = "cosine"         # cosine | constant | piecewise
    warmup_steps: int = 500
    total_steps: int = 300_000
    weight_decay: float = 0.0
    batch_size: int = 8
    crop_h: int = 270
    crop_w: int = 513
    seed: int = 37
    ckpt_dir: str = "checkpoints"
    ckpt_every: int = 2000
    log_every: int = 50
    keep_ckpts: int = 5
    # BN-freeze fine-tune: forward with the fixed running statistics (eval
    # mode) while training, so weights adapt to the stats eval will use.
    freeze_bn: bool = False
    # Integrated BN-freeze tail: from this step on, the train CLI switches to
    # the freeze_bn step automatically, so one run closes the batch-stat /
    # running-stat gap without a separate fine-tune ritual (docs/training.md
    # "BN-freeze fine-tune").  0 disables.
    freeze_bn_after: int = 0
    # Training-mode repack (models/repack.py::repack_linear): faithful-form
    # parameters executed through the packed s2d twin during freeze_bn
    # phases — the faithful NHWC training tax disappears while optimizer
    # state and checkpoints stay reference-compatible.
    packed_exec: bool = False
    # Host-RSS guard: when process RSS exceeds this, save a checkpoint and
    # exit(75) so a supervisor can restart-and-resume.  Works around the
    # remote-TPU client leaking host memory per host->device transfer
    # (scripts/diag_leak.py); harmless elsewhere. <=0 disables.
    max_rss_gb: float = 80.0


@dataclasses.dataclass
class MeshConfig:
    """Device mesh axes: data x tile(H) x disp(S)."""
    data: int = -1                      # -1: all devices on the data axis
    tile: int = 1
    disp: int = 1


@dataclasses.dataclass
class DataConfig:
    dataset: str = "sceneflow"
    root: str = ""
    split: str = "train"
    img_rows: int = 540
    img_cols: int = 960
    num_workers: int = 4
    mask_thold: float = 0.3
    mask_source: str = "compute"        # compute | precomputed | wavelet
    # Generate synthetic batches on-device (data.device_synth): zero per-step
    # host->device transfer and an infinite non-repeating stream. Only valid
    # with dataset="synthetic".
    on_device: bool = False
    # Synthetic-scene recipe: "default" (smooth bg + boxes + thin bars) or
    # "stressor" (adversarial thin structures over repetitive texture at
    # large disparity offsets — the configuration where dense upsampling is
    # structurally unable to recover the disparity; device_synth.py).
    variant: str = "default"


@dataclasses.dataclass
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)

    def to_dict(self):
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict, lenient: bool = False) -> "Config":
        """Build from a nested dict.  Strict mode (user-authored configs)
        raises on unknown keys; lenient mode (auto-loaded checkpoint config
        sidecars, which may come from a newer code revision) warns and skips
        them so older code degrades gracefully."""
        def build(tp, sub):
            fields = {f.name: f for f in dataclasses.fields(tp)}
            kwargs = {}
            for k, v in sub.items():
                if k not in fields:
                    if lenient:
                        print(f"config: ignoring unknown key "
                              f"{tp.__name__}.{k} (newer revision?)")
                        continue
                    raise KeyError(f"unknown config key {tp.__name__}.{k}")
                if isinstance(v, list):
                    v = tuple(v)
                kwargs[k] = v
            return tp(**kwargs)

        return cls(model=build(ModelConfig, d.get("model", {})),
                   loss=build(LossConfig, d.get("loss", {})),
                   train=build(TrainConfig, d.get("train", {})),
                   mesh=build(MeshConfig, d.get("mesh", {})),
                   data=build(DataConfig, d.get("data", {})))

    @classmethod
    def load(cls, path: str, lenient: bool = False) -> "Config":
        with open(path) as f:
            if path.endswith((".yaml", ".yml")) and yaml is not None:
                return cls.from_dict(yaml.safe_load(f) or {}, lenient=lenient)
            return cls.from_dict(json.load(f), lenient=lenient)

    def save(self, path: str):
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)

    def apply_overrides(self, overrides: List[str]) -> "Config":
        """Apply 'section.key=value' CLI overrides, e.g. model.max_disp=192."""
        d = self.to_dict()
        for ov in overrides:
            key, _, val = ov.partition("=")
            parts = key.split(".")
            cur = d
            for p in parts[:-1]:
                cur = cur[p]
            old = cur.get(parts[-1])
            cur[parts[-1]] = _parse_value(val, old)
        return Config.from_dict(d)


def _parse_value(val: str, old):
    if val.lower() in ("none", "null") and not isinstance(old, str):
        return None  # clear an optional field (e.g. loss.binary_thold)
    if old is None:
        # optional fields: best-effort literal parse
        try:
            return _int_or_float(val)
        except ValueError:
            return val
    if isinstance(old, bool):
        return val.lower() in ("1", "true", "yes")
    if isinstance(old, int):
        return int(val)
    if isinstance(old, float):
        return float(val)
    if isinstance(old, (tuple, list)):
        if val.startswith("["):
            return tuple(json.loads(val))
        return tuple(_int_or_float(x) for x in val.split(","))
    return val


def _int_or_float(x: str):
    """Parse '-1' as int(-1), '1.5' as float (negative ints stay ints)."""
    try:
        return int(x)
    except ValueError:
        return float(x)
