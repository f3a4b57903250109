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


def load_matching_params(params, loaded, verbose: bool = False):
    """Shape-matched partial parameter load.

    Rebuilds the reference's `load_matching_weights` (image_diffusion/
    unet.py:22-40): copy every leaf from `loaded` whose path exists in
    `params` with an identical shape; keep the fresh init elsewhere.
    Returns (merged_params, n_copied, n_skipped).
    """
    import jax

    flat_p = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    flat_l = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_flatten_with_path(loaded)[0]}
    copied = skipped = 0
    merged = dict(flat_p)
    for key, val in flat_l.items():
        if key in flat_p and tuple(flat_p[key].shape) == tuple(val.shape):
            merged[key] = val
            copied += 1
        else:
            skipped += 1
            if verbose:
                print(f"[load_matching_params] skip {key}")
    # rebuild the tree
    leaves_by_path = merged
    paths, treedef = jax.tree_util.tree_flatten_with_path(params)
    new_leaves = [leaves_by_path[jax.tree_util.keystr(k)]
                  for k, _ in paths]
    out = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return out, copied, skipped
