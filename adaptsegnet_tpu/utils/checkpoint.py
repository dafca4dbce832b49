"""Checkpointing: orbax full-state + reference-layout .pth snapshots.

The reference saves only model weights every 5k steps
(train_gta2cityscapes_multi.py:304-311,482-493,705-719 — optimizer/RNG state
is lost, SURVEY.md §5.3-5.4). Here:

  * `save_snapshot_pth` keeps the external contract: GTA5_<iter>.pth (+
    _D1/_D2.pth) files loadable by the reference's evaluate/compute scripts;
  * `CheckpointManager` (orbax) persists the full TrainState pytree —
    params, BOTH optimizer states, warper stats, step — for exact resume.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Any, Optional

import jax
import numpy as np

from adaptsegnet_tpu.utils import pth_interop


def save_snapshot_pth(
    snapshot_dir: str,
    mode_subdir: str,
    step: int,
    generator_variables: Any,
    d1_variables: Optional[Any] = None,
    d2_variables: Optional[Any] = None,
    model: str = "DeepLab",
):
    """Write GTA5_<step>.pth (+ _D1/_D2) in the reference layout/naming."""
    out_dir = osp.join(snapshot_dir, mode_subdir)
    os.makedirs(out_dir, exist_ok=True)
    if model == "DeeplabVGG":
        sd = pth_interop.variables_to_vgg_state_dict(generator_variables)
    else:
        sd = pth_interop.variables_to_resnet_state_dict(generator_variables)
    pth_interop.save_torch_state_dict(sd, osp.join(out_dir, f"GTA5_{step}.pth"))
    for tag, dv in (("D1", d1_variables), ("D2", d2_variables)):
        if dv is not None:
            dsd = pth_interop.variables_to_discriminator_state_dict(dv)
            pth_interop.save_torch_state_dict(
                dsd, osp.join(out_dir, f"GTA5_{step}_{tag}.pth")
            )


class CheckpointManager:
    """Thin orbax wrapper for full-TrainState save/restore."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._dir = osp.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state):
        import orbax.checkpoint as ocp

        # tx fields are static (pytree_node=False) so the pytree is pure data.
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_like, step: Optional[int] = None):
        """Restore into the structure of `state_like` (same tx objects)."""
        import orbax.checkpoint as ocp

        step = self.latest_step() if step is None else step
        if step is None:
            return None
        def to_abstract(x):
            if not hasattr(x, "dtype"):
                return x
            # Carry the sharding of the live state so orbax lays restored
            # arrays out on the mesh directly (no unsharded round-trip).
            sharding = getattr(x, "sharding", None)
            return jax.ShapeDtypeStruct(np.shape(x), x.dtype, sharding=sharding)

        abstract = jax.tree.map(to_abstract, state_like)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))
