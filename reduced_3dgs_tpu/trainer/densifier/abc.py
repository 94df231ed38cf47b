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


class AppendSpec(NamedTuple):
    """Static-shape device-side append: for every selected source row,
    append `copies` rows taken from `values` (a params pytree of
    [C, copies, ...] arrays). Lets densify events run fully on device
    through functional.scatter_append — no host round trip of the state."""
    select: Any            # [C] bool, already gated by the alive mask
    values: Any            # param-name -> [C, copies, ...]
    copies: int


class DensificationInstruction(NamedTuple):
    new_points: Optional[Dict[str, Any]] = None   # param-name -> [M, ...]
    remove_mask: Optional[Any] = None             # [N] or [C] bool
    appends: tuple = ()                           # tuple of AppendSpec

    def merge_remove(self, mask):
        if mask is None:
            return self
        if self.remove_mask is None:
            return self._replace(remove_mask=mask)
        a, b = self.remove_mask, mask
        # Masks may be [n_alive]-sized (host convention) or [C]-sized
        # (device convention); pad the shorter with False.
        if hasattr(a, "shape") and hasattr(b, "shape") and a.shape != b.shape:
            big = max(a.shape[0], b.shape[0])
            def pad(m):
                return (jnp.concatenate(
                    [jnp.asarray(m), jnp.zeros((big - m.shape[0],), bool)])
                    if m.shape[0] < big else jnp.asarray(m))
            a, b = pad(a), pad(b)
        return self._replace(remove_mask=jnp.logical_or(a, b))

    def add_append(self, spec: AppendSpec):
        return self._replace(appends=self.appends + (spec,))


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

    def fires_at(self, step: int) -> bool:
        """Would densify_and_prune do real work at `step`? Window batching
        (AbstractTrainer.step_many) fires the densifier chain only at
        window-final steps; unknown densifiers conservatively disable
        batching."""
        return True


class NoopDensifier(AbstractDensifier):
    """Chain terminator (reference NoopDensifier)."""

    def densify_and_prune(self, loss, out, camera, step: int) -> DensificationInstruction:
        return DensificationInstruction()

    def fires_at(self, step: int) -> bool:
        return False


class DensifierWrapper(AbstractDensifier):

    def __init__(self, base_densifier: AbstractDensifier):
        super().__init__(base_densifier.model)
        self.base_densifier = base_densifier

    @property
    def model(self):
        return self.base_densifier.model

    def densify_and_prune(self, loss, out, camera, step: int) -> DensificationInstruction:
        return self.base_densifier.densify_and_prune(loss, out, camera, step)

    def fires_at(self, step: int) -> bool:
        # Safe-by-construction (same protocol as TrainerWrapper.fires_at):
        # a subclass overriding densify_and_prune without declaring its
        # cadence disables window batching.
        cls = type(self)
        if (cls.densify_and_prune is not DensifierWrapper.densify_and_prune
                and cls.fires_at is DensifierWrapper.fires_at):
            return True
        return self.base_densifier.fires_at(step)


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

    def fires_at(self, step: int) -> bool:
        return self.densifier.fires_at(step) or super().fires_at(step)

    def apply_instruction(self, instruction: DensificationInstruction):
        if (instruction.new_points is None and instruction.remove_mask is None
                and not instruction.appends):
            return
        # Device fast path (VERDICT r01 #5): events expressed as [C]-static
        # appends/removals run as one jitted program — no host round trip
        # of the full state (the host path moves ~C x 59 floats twice per
        # event). Falls back to the host path on append overflow (capacity
        # growth) or when a densifier produced host-materialised
        # new_points.
        if instruction.new_points is None:
            if self._apply_instruction_device(instruction):
                return
        # Host path: fold any AppendSpecs into new_points (merged with
        # host-materialised new_points if both are present — dropping the
        # appends here would silently lose clone/split points).
        instruction = self._materialize_appends(instruction)
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

    # ----------------------------------------------------- device fast path
    def _apply_instruction_device(self, instruction) -> bool:
        """Apply remove/append fully on device. Returns False when the
        caller must fall back to the host path (append overflowed the
        capacity)."""
        import jax

        from .. import functional as F
        engine = self.engine
        c = engine.capacity
        trees = engine.state_trees()

        remove = instruction.remove_mask
        if remove is None:
            remove_c = jnp.zeros((c,), bool)
        else:
            remove = jnp.asarray(remove)
            remove_c = (remove if remove.shape[0] == c else jnp.concatenate(
                [remove, jnp.zeros((c - remove.shape[0],), bool)]))

        copies_sig = tuple(sp.copies for sp in instruction.appends)
        cache = getattr(engine, "_event_fns", None)
        if cache is None:
            cache = engine._event_fns = {}
        key = (c, copies_sig)
        if key not in cache:
            model = self.model
            n_appends = len(copies_sig)

            @jax.jit
            def event(trees, n_alive, remove_c, selects, values_list):
                n0 = n_alive
                n = n_alive
                overflow = jnp.bool_(False)
                aux1 = model.aux_for_new_points(1)
                for i in range(n_appends):
                    sel, vals = selects[i], values_list[i]
                    k = copies_sig[i]
                    # Full-tree values: given params, zero Adam moments and
                    # accumulators, model-defined aux fill.
                    def full_values(leaf_tree, group):
                        if group == "params":
                            return vals
                        if group == "aux":
                            return jax.tree.map(
                                lambda a, v: jnp.broadcast_to(
                                    v[None],
                                    (c, k) + a.shape[1:]).astype(a.dtype)
                                if a.ndim > 0 else a,
                                leaf_tree, aux1)
                        return jax.tree.map(
                            lambda a: jnp.zeros((c, k) + a.shape[1:],
                                                a.dtype)
                            if a.ndim > 0 else a, leaf_tree)
                    values = {g: full_values(t, g)
                              for g, t in trees.items()}
                    trees, n, ovf = F.scatter_append(trees, values, sel, n, k)
                    overflow = overflow | ovf
                appended = (jnp.arange(c) >= n0) & (jnp.arange(c) < n)
                keep = (F.alive_mask(c, n0) & ~remove_c) | appended
                trees, new_n = F.compact(trees, keep, n)
                return trees, new_n, overflow

            cache[key] = event

        selects = tuple(jnp.asarray(sp.select) for sp in instruction.appends)
        values_list = tuple(sp.values for sp in instruction.appends)
        new_trees, new_n, overflow = cache[key](
            trees, engine.n_alive, remove_c, selects, values_list)
        if copies_sig and bool(overflow):
            return False      # capacity exhausted -> host path grows it
        engine.set_state_trees(new_trees, int(new_n))
        return True

    def _materialize_appends(self, instruction):
        """Host fallback: turn AppendSpecs into [M, ...] new_points."""
        if not instruction.appends:
            return instruction
        rows = {}
        for sp in instruction.appends:
            sel = np.asarray(sp.select)
            for k, v in sp.values.items():
                v = np.asarray(v)[sel].reshape((-1,) + v.shape[2:])
                rows.setdefault(k, []).append(v)
        new_points = {k: np.concatenate(v, axis=0) for k, v in rows.items()}
        merged = (_concat_points(instruction.new_points, new_points)
                  if instruction.new_points is not None else new_points)
        return instruction._replace(new_points=merged, appends=())

    @classmethod
    def from_densifier_constructor(cls, densifier_constructor, model, dataset,
                                   trainer_constructor=Trainer, **configs):
        base = trainer_constructor(model, dataset, **configs)
        densifier = densifier_constructor(model, dataset, **configs)
        return cls(base, densifier)


def _concat_points(a, b):
    return {k: np.concatenate([np.asarray(a[k]), np.asarray(b[k])], axis=0)
            for k in b}
