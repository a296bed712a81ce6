"""Model registry (reference modules/__init__.py:7-28)."""
from __future__ import annotations

from decnet_tpu.config import ModelConfig
from decnet_tpu.models.decnet import DecNet

_MODELS = {
    "decnet": DecNet,
    # reference name kept as an alias for CLI parity (modules/__init__.py:19)
    "sparsedensenetrefinementmask": DecNet,
}


def get_model(name: str = "decnet", cfg: ModelConfig | None = None, **kwargs):
    key = name.lower()
    if key not in _MODELS:
        raise KeyError(f"Model {name} not available; have {list(_MODELS)}")
    if cfg is None:
        cfg = ModelConfig(arch=key, **kwargs)
    return _MODELS[key](cfg=cfg)
