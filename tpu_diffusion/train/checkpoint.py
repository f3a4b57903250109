"""Checkpointing via orbax (replaces the reference's three mechanisms:
raw `torch.save` dicts at cifar10/train_cifar10.py:160-169, the indexed
`CheckpointManager` at image_diffusion/checkpoint_manager.py:5-72, and
Lightning ModelCheckpoint at src/train.py:65-81).

Stores {params, ema, opt_state, step, rng} with max-N retention and
restart-from-latest — the elastic-recovery path that replaces the
reference's SLURM timeout-requeue scripts (slurm_scripts/train.sh:38-43).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

PyTree = Any


class CheckpointManager:
    """Thin orbax wrapper with the reference CheckpointManager's interface:
    save(index, assets), load() -> (assets, step)."""

    def __init__(self, directory: str, maximum: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=maximum, create=True, enable_async_checkpointing=False),
        )

    def save(self, step: int, assets: PyTree, force: bool = False) -> bool:
        ok = self._mgr.save(step, args=ocp.args.StandardSave(assets),
                            force=force)
        self._mgr.wait_until_finished()
        return ok

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def load(self, initial_assets: PyTree):
        """Restore the newest checkpoint, or return `initial_assets` when
        none exists (reference checkpoint_manager.py:58-72)."""
        step = self._mgr.latest_step()
        if step is None:
            return initial_assets, 0
        target = jax.tree.map(lambda x: x, initial_assets)
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(target))
        return restored, step

    def close(self):
        self._mgr.close()
