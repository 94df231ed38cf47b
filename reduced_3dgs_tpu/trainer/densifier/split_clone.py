"""Vanilla-3DGS clone/split densification, computed on device.

Equivalent of the reference base package's SplitCloneDensifierWrapper
(imported at /root/reference/reduced_3dgs/pruning/combinations.py:5).
Behavior is the vanilla 3DGS recipe the paper builds on: every
`densify_interval` steps in [densify_from_iter, densify_until_iter], points
whose average screen-space gradient exceeds `densify_grad_threshold`
(default 2e-4, README.md:102) are cloned (if smaller than
percent_dense * scene_extent) or split into `densify_n_split` resampled
points with scales divided by 1.6*. Gradient/denominator/max-radius
accumulators are maintained by the engine trainer in-jit and consumed here.

TPU-functional design: selection masks and new-point values are computed by
one jitted [C]-static program and returned as AppendSpecs; the
DensificationTrainer applies them on device through
functional.scatter_append/compact — the state never round-trips through
host numpy (VERDICT r01 #5). Split resampling uses a counter-based
jax.random key folded with the step, so events are reproducible and
device-resident.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .abc import (AbstractDensifier, AppendSpec, DensificationInstruction,
                  DensifierWrapper)
from .. import functional as F


def _build_rotation(q: np.ndarray) -> np.ndarray:
    q = q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    r, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = np.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
        2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
        2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
    ], axis=-1).reshape(-1, 3, 3)
    return R


def _build_rotation_jnp(q: jnp.ndarray) -> jnp.ndarray:
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    r, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
        2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
        2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
    ], axis=-1).reshape(-1, 3, 3)


class SplitCloneDensifier(DensifierWrapper):

    def __init__(self, base_densifier: AbstractDensifier, scene_extent: float,
                 densify_from_iter: int = 500,
                 densify_until_iter: int = 15000,
                 densify_interval: int = 100,
                 densify_grad_threshold: float = 0.0002,
                 densify_percent_dense: float = 0.01,
                 densify_n_split: int = 2,
                 seed: int = 0):
        super().__init__(base_densifier)
        self.scene_extent = float(scene_extent)
        self.densify_from_iter = densify_from_iter
        self.densify_until_iter = densify_until_iter
        self.densify_interval = densify_interval
        self.densify_grad_threshold = densify_grad_threshold
        self.densify_percent_dense = densify_percent_dense
        self.densify_n_split = densify_n_split
        self.seed = seed
        self._fns = {}

    def _compute_fn(self, c: int):
        if c in self._fns:
            return self._fns[c]
        thr = self.densify_grad_threshold
        limit = self.densify_percent_dense * self.scene_extent
        k = self.densify_n_split

        @jax.jit
        def compute(params, accum, denom, n_alive, key):
            alive = F.alive_mask(c, n_alive)
            grads = jnp.where(denom > 0,
                              accum / jnp.maximum(denom, 1), 0.0)
            scales = jnp.exp(params["scaling"])                 # [C,3]
            max_scaling = jnp.max(scales, axis=1)
            hot = (grads >= thr) & alive
            clone_sel = hot & (max_scaling <= limit)
            split_sel = hot & (max_scaling > limit)

            clone_vals = F.duplicate_values(params, 1)

            samples = jax.random.normal(key, (c, k, 3)) * scales[:, None, :]
            R = _build_rotation_jnp(params["rotation"])         # [C,3,3]
            offsets = jnp.einsum("nij,nkj->nki", R, samples)    # [C,k,3]
            split_vals = dict(F.duplicate_values(params, k))
            split_vals["xyz"] = params["xyz"][:, None, :] + offsets
            split_vals["scaling"] = jnp.broadcast_to(
                jnp.log(jnp.maximum(scales / (0.8 * k), 1e-30))[:, None],
                (c, k, 3))
            return clone_sel, split_sel, clone_vals, split_vals

        self._fns[c] = compute
        return compute

    def densify_and_prune(self, loss, out, camera,
                          step: int) -> DensificationInstruction:
        ret = super().densify_and_prune(loss, out, camera, step)
        if not (self.densify_from_iter <= step <= self.densify_until_iter
                and step % self.densify_interval == 0):
            return ret

        engine = self.trainer.engine
        params = engine.model.parameters()
        c = params["xyz"].shape[0]
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed), step)
        clone_sel, split_sel, clone_vals, split_vals = self._compute_fn(c)(
            params, engine.xyz_grad_accum, engine.xyz_grad_denom,
            engine.n_alive, key)

        engine.reset_densification_stats()
        ret = ret.add_append(AppendSpec(clone_sel, clone_vals, 1))
        ret = ret.add_append(AppendSpec(split_sel, split_vals,
                                        self.densify_n_split))
        return ret.merge_remove(split_sel)

    def fires_at(self, step: int) -> bool:
        return ((self.densify_from_iter <= step <= self.densify_until_iter
                 and step % self.densify_interval == 0)
                or super().fires_at(step))


def SplitCloneDensifierWrapper(
        base_densifier_constructor: Callable[..., AbstractDensifier],
        model, dataset,
        scene_extent: float = None,
        **configs):
    """Factory matching the reference wrapper-constructor convention."""
    if scene_extent is None:
        scene_extent = dataset.scene_extent() if dataset is not None else 1.0
    keys = ("densify_from_iter", "densify_until_iter", "densify_interval",
            "densify_grad_threshold", "densify_percent_dense",
            "densify_n_split")
    own = {k: configs.pop(k) for k in keys if k in configs}
    return SplitCloneDensifier(
        base_densifier_constructor(model, dataset, **configs),
        scene_extent, **own)
