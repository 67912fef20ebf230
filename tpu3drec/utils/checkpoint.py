"""Checkpoint / resume via orbax.

Capability-parity with the reference's training persistence
(`ref/monodepth2/trainer.py:598-643`): periodic epoch checkpoints of every
model plus the Adam state (`adam.pth`), partial restore (the reference
merges state dicts model-by-model, `trainer.py:626-634`), and the run
config dumped alongside (`models/opt.json`, `trainer.py:587-596`). Here a
checkpoint is one pytree {params, batch_stats, opt_state, step} written
atomically by orbax, sharding-aware out of the box (multi-host safe —
which `torch.save` never was).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin orbax wrapper with the reference's save-frequency semantics."""

    def __init__(self, directory: str, max_to_keep: int = 5,
                 save_frequency: int = 5):
        # save_frequency in epochs, reference default 5 (`options.py:164-167`)
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.save_frequency = save_frequency
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save_config(self, cfg: Any) -> None:
        """Dump the run config next to the weights (`trainer.py:587-596`)."""
        if dataclasses.is_dataclass(cfg):
            cfg = dataclasses.asdict(cfg)
        with open(os.path.join(self.directory, "opt.json"), "w") as f:
            json.dump(cfg, f, indent=2, default=str)

    def maybe_save(self, epoch: int, state) -> bool:
        """Save if the epoch hits the save frequency (`trainer.py:191-192`)."""
        if (epoch + 1) % self.save_frequency == 0:
            self.save(epoch, state)
            return True
        return False

    def save(self, step: int, state) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(_to_save(state)))
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, state_template, step: int | None = None):
        """Restore into the template's structure (shapes/dtypes/shardings).
        Returns the template unchanged if no checkpoint exists."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return state_template
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(_to_save(state_template))
        )
        return _from_save(state_template, restored)

    def close(self):
        self._mgr.close()


def _to_save(state):
    """TrainState (or any pytree) -> plain dict pytree orbax likes."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    return {"leaves": leaves}


def _from_save(template, restored):
    _, treedef = jax.tree_util.tree_flatten(template)
    return jax.tree_util.tree_unflatten(treedef, restored["leaves"])


def restore_partial(params, loaded: dict) -> dict:
    """Merge loaded params into an existing tree, keeping entries absent
    from the checkpoint — the reference's per-model partial state-dict merge
    (`trainer.py:626-634`) generalized to pytrees."""
    flat_p = _flatten(params)
    flat_l = _flatten(loaded)
    merged = dict(flat_p)
    for k, v in flat_l.items():
        if k in merged and np.shape(merged[k]) == np.shape(v):
            merged[k] = v
    return _unflatten(merged)


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat: dict):
    root: dict = {}
    for path, v in flat.items():
        d = root
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = v
    return root
