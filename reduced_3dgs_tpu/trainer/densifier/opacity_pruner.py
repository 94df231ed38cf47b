"""Opacity / screen-size / world-size pruning.

Equivalent of the reference base package's OpacityPruner densifier wrapper
(used by BasePruner, /root/reference/reduced_3dgs/pruning/trainer.py:84-103),
with the defaults the reference pins (pruning/trainer.py:115-121):
prune_from_iter=1000, prune_until_iter=15000, prune_interval=100,
prune_screensize_threshold=20, prune_percent_too_big=1,
prune_opacity_threshold=0.005.

Semantics follow the vanilla-3DGS prune: a point is removed when its opacity
falls below the threshold, or (once opacity resets have begun) when its
max observed screen radius exceeds the screen-size threshold or its world
size exceeds 0.1 * percent_too_big * scene_extent.
"""
from __future__ import annotations

from typing import Callable

import numpy as np

from .abc import AbstractDensifier, DensificationInstruction, DensifierWrapper


class OpacityPruner(DensifierWrapper):

    def __init__(self, base_densifier: AbstractDensifier, dataset,
                 scene_extent: float = None,
                 prune_from_iter: int = 1000,
                 prune_until_iter: int = 15000,
                 prune_interval: int = 100,
                 prune_screensize_threshold: float = 20,
                 prune_percent_too_big: float = 1,
                 prune_opacity_threshold: float = 0.005,
                 prune_big_from_iter: int = 3000):
        super().__init__(base_densifier)
        if scene_extent is None:
            scene_extent = dataset.scene_extent() if dataset is not None else 1.0
        self.scene_extent = float(scene_extent)
        self.prune_from_iter = prune_from_iter
        self.prune_until_iter = prune_until_iter
        self.prune_interval = prune_interval
        self.prune_screensize_threshold = prune_screensize_threshold
        self.prune_percent_too_big = prune_percent_too_big
        self.prune_opacity_threshold = prune_opacity_threshold
        self.prune_big_from_iter = prune_big_from_iter
        self._curr_prune_step = 0

    def prune(self) -> np.ndarray:
        """[N] bool removal mask."""
        engine = self.trainer.engine
        n = int(engine.n_alive)
        params = engine.model.parameters()
        opacity = 1.0 / (1.0 + np.exp(-np.asarray(params["opacity"])[:n, 0]))
        mask = opacity < self.prune_opacity_threshold
        if self._curr_prune_step > self.prune_big_from_iter:
            max_radii = np.asarray(engine.max_radii2d)[:n]
            mask |= max_radii > self.prune_screensize_threshold
            max_scaling = np.exp(np.asarray(params["scaling"])[:n]).max(axis=1)
            mask |= max_scaling > 0.1 * self.prune_percent_too_big * self.scene_extent
        return mask

    def densify_and_prune(self, loss, out, camera, step: int) -> DensificationInstruction:
        ret = super().densify_and_prune(loss, out, camera, step)
        if (self.prune_from_iter <= step <= self.prune_until_iter
                and step % self.prune_interval == 0):
            self._curr_prune_step = step
            ret = ret.merge_remove(self.prune())
        return ret

    def fires_at(self, step: int) -> bool:
        return ((self.prune_from_iter <= step <= self.prune_until_iter
                 and step % self.prune_interval == 0)
                or super().fires_at(step))


def OpacityPrunerDensifierWrapper(
        base_densifier_constructor: Callable[..., AbstractDensifier],
        model, dataset, **configs):
    keys = ("scene_extent", "prune_from_iter", "prune_until_iter",
            "prune_interval", "prune_screensize_threshold",
            "prune_percent_too_big", "prune_opacity_threshold",
            "prune_big_from_iter")
    own = {k: configs.pop(k) for k in keys if k in configs}
    return OpacityPruner(
        base_densifier_constructor(model, dataset, **configs), dataset, **own)
