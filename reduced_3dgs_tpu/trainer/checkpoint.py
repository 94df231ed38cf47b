"""Full training-state checkpoint / resume.

The reference checkpoints only the model as a PLY (optimizer state is lost,
SURVEY.md section 5.4). Here the COMPLETE engine state — parameters, Adam
moments, densification accumulators, aux state (SH degrees), live count and
step — round-trips through one .npz, so training resumes bit-exactly.
"""
from __future__ import annotations

import json
import os
from typing import Dict

import jax.numpy as jnp
import numpy as np

from .base import BaseTrainer
from .optimizer import AdamState


def save_checkpoint(trainer, path: str):
    """Serialise the engine state of any (wrapped) trainer to `path`."""
    engine: BaseTrainer = trainer.engine
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    trees = engine.state_trees()
    flat: Dict[str, np.ndarray] = {}
    for group, tree in trees.items():
        for k, v in tree.items():
            flat[f"{group}/{k}"] = np.asarray(v)
    flat["meta/adam_count"] = np.asarray(engine.adam.count)
    meta = {
        "n_alive": int(engine.n_alive),
        "curr_step": int(engine.curr_step),
        "capacity": int(engine.capacity),
        "active_sh_degree": int(engine.model.active_sh_degree),
        "spatial_lr_scale": float(engine.spatial_lr_scale),
    }
    np.savez(path, __meta__=json.dumps(meta), **flat)


def load_checkpoint(trainer, path: str):
    """Restore engine state saved by save_checkpoint. The trainer must have
    been constructed over a model with the same max SH degree."""
    engine: BaseTrainer = trainer.engine
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    trees = engine.state_trees()
    new_trees = {}
    for group, tree in trees.items():
        new_trees[group] = {k: jnp.asarray(data[f"{group}/{k}"]) for k in tree}
    engine.capacity = meta["capacity"]
    engine._step_fns.clear()
    engine._key_buffer_size.clear()
    engine.set_state_trees(new_trees, meta["n_alive"])
    engine.adam = AdamState(count=jnp.asarray(data["meta/adam_count"]),
                            m=engine.adam.m, v=engine.adam.v)
    engine.curr_step = meta["curr_step"]
    engine.model.active_sh_degree = meta["active_sh_degree"]
    engine.spatial_lr_scale = meta["spatial_lr_scale"]
    return trainer
