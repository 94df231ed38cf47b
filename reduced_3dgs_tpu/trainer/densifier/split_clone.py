"""Vanilla-3DGS clone/split densification.

Equivalent of the reference base package's SplitCloneDensifierWrapper
(imported at /root/reference/reduced_3dgs/pruning/combinations.py:7).
Behavior is the vanilla 3DGS recipe the paper builds on: every
`densify_interval` steps in [densify_from_iter, densify_until_iter], points
whose average screen-space gradient exceeds `densify_grad_threshold`
(default 2e-4, README.md:102) are cloned (if smaller than
percent_dense * scene_extent) or split into two resampled points with scales
divided by 1.6 (if larger). Gradient/denominator/max-radius accumulators are
maintained by the engine trainer in-jit and consumed here.
"""
from __future__ import annotations

from typing import Callable

import numpy as np

from .abc import AbstractDensifier, DensificationInstruction, DensifierWrapper


def _build_rotation(q: np.ndarray) -> np.ndarray:
    q = q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    r, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = np.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
        2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
        2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
    ], axis=-1).reshape(-1, 3, 3)
    return R


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
        self.rng = np.random.default_rng(seed)

    def densify_and_prune(self, loss, out, camera, step: int) -> DensificationInstruction:
        ret = super().densify_and_prune(loss, out, camera, step)
        if not (self.densify_from_iter <= step <= self.densify_until_iter
                and step % self.densify_interval == 0):
            return ret

        engine = self.trainer.engine
        n = int(engine.n_alive)
        accum = np.asarray(engine.xyz_grad_accum)[:n]
        denom = np.asarray(engine.xyz_grad_denom)[:n]
        grads = np.where(denom > 0, accum / np.maximum(denom, 1), 0.0)

        params = {k: np.asarray(v)[:n] for k, v in
                  engine.model.parameters().items()}
        scales = np.exp(params["scaling"])
        max_scaling = scales.max(axis=1)
        limit = self.densify_percent_dense * self.scene_extent

        hot = grads >= self.densify_grad_threshold
        clone_mask = hot & (max_scaling <= limit)
        split_mask = hot & (max_scaling > limit)

        new_points = {k: params[k][clone_mask] for k in params}

        if split_mask.any():
            m = int(split_mask.sum())
            k = self.densify_n_split
            src = {kk: np.repeat(params[kk][split_mask], k, axis=0)
                   for kk in params}
            stds = np.repeat(scales[split_mask], k, axis=0)
            samples = self.rng.standard_normal(stds.shape).astype(np.float32) * stds
            R = _build_rotation(src["rotation"])
            offsets = np.einsum("nij,nj->ni", R, samples)
            src["xyz"] = src["xyz"] + offsets
            src["scaling"] = np.log(np.repeat(scales[split_mask], k, 0)
                                    / (0.8 * k)).astype(np.float32)
            new_points = {kk: np.concatenate([new_points[kk], src[kk]], axis=0)
                          for kk in params}

        engine.reset_densification_stats()
        if len(next(iter(new_points.values()))) == 0 and not split_mask.any():
            return ret
        ret = ret._replace(new_points=_concat_new(ret.new_points, new_points))
        return ret.merge_remove(split_mask)


def _concat_new(a, b):
    if a is None:
        return b
    return {k: np.concatenate([np.asarray(a[k]), b[k]], axis=0) for k in b}


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
