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


def load_pretrained(path: str) -> Optional[PyTree]:
    """Restore the newest checkpoint under `path` as a raw pytree (no
    target structure) for warm-starting — the bootstrap half of the
    reference's `model_path` table (experiments/config.py:159-167 feeding
    load_matching_weights). Returns None when no checkpoint exists."""
    path = os.path.abspath(path)
    if not os.path.isdir(path):
        return None
    mgr = ocp.CheckpointManager(
        path, options=ocp.CheckpointManagerOptions(
            create=False, enable_async_checkpointing=False))
    try:
        step = mgr.latest_step()
        if step is None:
            return None
        return mgr.restore(step, args=ocp.args.StandardRestore())
    finally:
        mgr.close()


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


def remap_norm_impl(params, to: str):
    """One-shot checkpoint migration between the two norm implementations.

    A UNet trained with `norm_impl="xla"` stores norm parameters under
    `<name>/GroupNorm_0/{scale,bias}` (where `<name>` is the auto-name
    `GroupNorm32_<k>` or an explicit one like the UNet head's `out_norm`)
    while `norm_impl="fused"` (the Pallas GroupNorm+FiLM+SiLU kernel)
    stores the same two vectors one level shallower under
    `<name>/{scale,bias}` (auto-name `FusedNormAct_<k>`). The weights are
    interchangeable (both impls use eps=1e-5, models/nn.py); only the paths
    differ. This rewrites the tree so a checkpoint trained with one impl
    can be applied with the other (`to` = "fused" or "xla") — no manual
    leaf surgery.

    Matching rules: toward "fused", any `{"GroupNorm_0": {scale, bias}}`
    wrapper is flattened (that wrapper only ever comes from GroupNorm32).
    Toward "xla", a flat `{scale, bias}` node is nested only when its key
    identifies a fused norm (`FusedNormAct*` auto-names or the UNet's
    explicitly-named `out_norm`) — a bare structural match would corrupt
    flax's own `GroupNorm_0`/LayerNorm leaves.
    """
    if to not in ("fused", "xla"):
        raise ValueError(f"to must be 'fused' or 'xla', got {to!r}")

    def is_scale_bias(d) -> bool:
        return (isinstance(d, dict) and bool(d)
                and set(d) <= {"scale", "bias"}
                and not any(isinstance(v, dict) for v in d.values()))

    def fused_name(key: str) -> str:
        return (f"FusedNormAct_{key.split('_')[-1]}"
                if key.startswith("GroupNorm32_") else key)

    def xla_name(key: str) -> str:
        return (f"GroupNorm32_{key.split('_')[-1]}"
                if key.startswith("FusedNormAct_") else key)

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for key, sub in node.items():
            if to == "fused" and isinstance(sub, dict) \
                    and set(sub) == {"GroupNorm_0"} \
                    and is_scale_bias(sub["GroupNorm_0"]):
                out[fused_name(key)] = dict(sub["GroupNorm_0"])
            elif to == "xla" \
                    and (key.startswith("FusedNormAct_")
                         or key == "out_norm") \
                    and is_scale_bias(sub):
                out[xla_name(key)] = {"GroupNorm_0": dict(sub)}
            else:
                out[key] = walk(sub)
        return out

    try:
        import flax
        params = flax.core.unfreeze(params)
    except ImportError:
        pass
    return walk(params)


def remap_by_order(target, loaded, strict: bool = True):
    """Positional checkpoint migration between two param trees of the SAME
    architecture whose module names differ (e.g. a tree saved before
    modules had explicit names: flax auto-names like `Conv_0`/`ResBlock_3`
    vs today's `conv_in`/`enc_0_0`).

    Both trees are flattened in canonical (sorted-key) order and matched
    leaf-by-leaf on shape. This is only sound when the two namings sort
    into the same leaf order — verify with `strict=True` (default), which
    raises on any shape mismatch instead of silently mispairing. For
    partial/shape-matched loads of same-named trees use
    `load_matching_params` instead.
    """
    import jax

    t_paths, treedef = jax.tree_util.tree_flatten_with_path(target)
    l_leaves = jax.tree_util.tree_leaves(loaded)
    if len(t_paths) != len(l_leaves):
        raise ValueError(
            f"leaf count mismatch: target {len(t_paths)} vs loaded "
            f"{len(l_leaves)} — not the same architecture")
    new = []
    for (path, tgt), leaf in zip(t_paths, l_leaves):
        if tuple(tgt.shape) != tuple(leaf.shape):
            msg = (f"shape mismatch at {jax.tree_util.keystr(path)}: "
                   f"target {tgt.shape} vs loaded {leaf.shape}")
            if strict:
                raise ValueError(msg + " — positional remap unsound here; "
                                 "fix names or use load_matching_params")
            new.append(tgt)
            continue
        new.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new)
