"""Densifier abstractions + the trainer that drives them.

Mirrors the reference base package contract (usage:
/root/reference/reduced_3dgs/importance/trainer.py:8,184-229,
pruning/trainer.py:6,84-147): a chain of DensifierWrapper objects whose
`densify_and_prune(loss, out, camera, step)` returns a
DensificationInstruction; wrappers extend via super() and `_replace`
(OR-ing remove masks). `DensificationTrainer.from_densifier_constructor`
builds the full trainer.
"""
from __future__ import annotations

import abc
from typing import Any, Dict, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..abc import AbstractTrainer, TrainerWrapper
from ..base import Trainer


class DensificationInstruction(NamedTuple):
    new_points: Optional[Dict[str, Any]] = None   # param-name -> [M, ...]
    remove_mask: Optional[Any] = None             # [N] bool over live points

    def merge_remove(self, mask):
        if mask is None:
            return self
        if self.remove_mask is None:
            return self._replace(remove_mask=mask)
        return self._replace(remove_mask=jnp.logical_or(self.remove_mask, mask))


class AbstractDensifier(abc.ABC):

    def __init__(self, model):
        self._model = model
        self.trainer: Optional[AbstractTrainer] = None  # injected by DensificationTrainer

    @property
    def model(self):
        return self._model

    @abc.abstractmethod
    def densify_and_prune(self, loss, out, camera, step: int) -> DensificationInstruction:
        ...


class NoopDensifier(AbstractDensifier):
    """Chain terminator (reference NoopDensifier)."""

    def densify_and_prune(self, loss, out, camera, step: int) -> DensificationInstruction:
        return DensificationInstruction()


class DensifierWrapper(AbstractDensifier):

    def __init__(self, base_densifier: AbstractDensifier):
        super().__init__(base_densifier.model)
        self.base_densifier = base_densifier

    @property
    def model(self):
        return self.base_densifier.model

    def densify_and_prune(self, loss, out, camera, step: int) -> DensificationInstruction:
        return self.base_densifier.densify_and_prune(loss, out, camera, step)


def _inject_trainer(densifier: AbstractDensifier, trainer: AbstractTrainer):
    d = densifier
    while d is not None:
        d.trainer = trainer
        d = getattr(d, "base_densifier", None)


class DensificationTrainer(TrainerWrapper):
    """Runs the densifier chain after every optimizer step and applies the
    returned instruction to the engine state (reference DensificationTrainer
    contract, pruning/trainer.py:143-147)."""

    def __init__(self, base_trainer: AbstractTrainer, densifier: AbstractDensifier):
        super().__init__(base_trainer)
        self.densifier = densifier
        _inject_trainer(densifier, self)

    def optim_step(self):
        ret = super().optim_step()
        io = self.engine._last_step_io_engine
        if io is None:
            return ret
        loss, out, camera = io
        instruction = self.densifier.densify_and_prune(
            loss, out, camera, self.curr_step)
        self.apply_instruction(instruction)
        return ret

    def apply_instruction(self, instruction: DensificationInstruction):
        if instruction.new_points is None and instruction.remove_mask is None:
            return
        engine = self.engine
        n = int(engine.n_alive)
        trees = engine.state_trees()
        host = {k: {kk: np.asarray(vv)[:n] if hasattr(vv, "ndim") and vv.ndim > 0
                    else vv for kk, vv in t.items()}
                for k, t in trees.items()}

        if instruction.remove_mask is not None:
            keep = ~np.asarray(instruction.remove_mask)[:n]
            for t in host.values():
                for kk in t:
                    if hasattr(t[kk], "ndim") and t[kk].ndim > 0:
                        t[kk] = t[kk][keep]
            n = int(keep.sum())

        if instruction.new_points is not None:
            new = {k: np.asarray(v) for k, v in instruction.new_points.items()}
            m = len(next(iter(new.values())))
            if m > 0:
                for kk in host["params"]:
                    host["params"][kk] = np.concatenate(
                        [host["params"][kk], new[kk]], axis=0)
                for grp in ("adam_m", "adam_v"):
                    for kk in host[grp]:
                        z = np.zeros((m,) + host[grp][kk].shape[1:],
                                     host[grp][kk].dtype)
                        host[grp][kk] = np.concatenate([host[grp][kk], z], 0)
                aux_new = self.model.aux_for_new_points(m)
                for kk in host["aux"]:
                    host["aux"][kk] = np.concatenate(
                        [host["aux"][kk], np.asarray(aux_new[kk])], 0)
                for kk in host["accum"]:
                    z = np.zeros((m,) + host["accum"][kk].shape[1:],
                                 host["accum"][kk].dtype)
                    host["accum"][kk] = np.concatenate([host["accum"][kk], z], 0)
                n += m

        # Re-pad to capacity (growing if needed) and write back.
        from .. import functional as F
        if n > engine.capacity:
            engine.capacity = F.bucket_capacity(n)
            engine._step_fns.clear()
            engine._key_buffer_size.clear()
        cap = engine.capacity

        def pad_np(a):
            if not hasattr(a, "ndim") or a.ndim == 0:
                return a
            out = np.zeros((cap,) + a.shape[1:], a.dtype)
            out[: len(a)] = a
            return out

        trees_new = {k: {kk: jnp.asarray(pad_np(vv)) for kk, vv in t.items()}
                     for k, t in host.items()}
        engine.set_state_trees(trees_new, n)

    @classmethod
    def from_densifier_constructor(cls, densifier_constructor, model, dataset,
                                   trainer_constructor=Trainer, **configs):
        base = trainer_constructor(model, dataset, **configs)
        densifier = densifier_constructor(model, dataset, **configs)
        return cls(base, densifier)
