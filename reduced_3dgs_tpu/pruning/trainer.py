"""Redundancy ("mercy") pruning.

TPU-native equivalent of /root/reference/reduced_3dgs/pruning/trainer.py:
resolution-aware redundancy metric (minimum projected pixel size over all
cameras -> KNN(30) -> sphere/ellipsoid intersection counts -> per-point min
over intersecting neighbours incl. self) and the mercy-pruning policy
(threshold mean + lambda*std, min 3; then drop the lower-opacity half of the
redundant set). Defaults match the reference (pruning/trainer.py:71-77,
106-136).
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..dataset.dataset import CameraDataset
from ..models.gaussian_model import GaussianModel
from ..ops.knn import knn
from ..ops.redundancy import (allocate_minimum_redundancy_value,
                              find_minimum_projected_pixel_size,
                              sphere_ellipsoid_intersection)
from ..trainer import (AbstractDensifier, DensificationTrainer, NoopDensifier,
                       OpacityPruner)


def _metric_body(xyz, scaling, rotation, alive, full_proj, inv_proj,
                 heights, widths, pixel_scale, k: int):
    """Traced redundancy-metric body at CAPACITY shape [C].

    Dead rows are excluded via `alive`: they are pushed out of the KNN
    (mask arg), may not contribute to any point's minimum (their
    mask_full rows/cols are zeroed), and their own outputs are garbage the
    caller slices away. Running at capacity keeps the jitted program's
    shapes static across prune events — n_alive changes after EVERY mercy
    prune, and a [:n]-shaped program would recompile per event."""
    c = xyz.shape[0]
    cube_size = find_minimum_projected_pixel_size(
        full_proj, inv_proj, xyz, heights, widths)
    half_diagonal = cube_size * pixel_scale * jnp.sqrt(3.0) / 2.0

    _, indices = knn(xyz, k, mask=alive)

    _, mask = sphere_ellipsoid_intersection(
        xyz, scaling, rotation, indices, half_diagonal)
    # A window under-filled with live points can return dead/garbage
    # neighbours (inf distance but real indices): gate by BOTH endpoints'
    # liveness BEFORE counting, so stale dead rows can neither inflate a
    # live point's redundancy count nor spread through the segment-min.
    mask = mask & alive[:, None] & alive[indices]
    # the point itself was not counted: +1 (reference :36)
    counts = jnp.sum(mask, axis=1).astype(jnp.int32) + 1

    self_idx = jnp.arange(c, dtype=jnp.int32)[:, None]
    indices_full = jnp.concatenate([self_idx, indices], axis=1)
    mask_full = jnp.concatenate([alive[:, None], mask], axis=1)

    min_redundancy = allocate_minimum_redundancy_value(
        counts, indices_full, mask_full, num_points=c)
    return min_redundancy, cube_size


@partial(jax.jit, static_argnums=(9,))
def _metric_jit(xyz, scaling, rotation, alive, full_proj, inv_proj,
                heights, widths, pixel_scale, k: int):
    return _metric_body(xyz, scaling, rotation, alive, full_proj, inv_proj,
                        heights, widths, pixel_scale, k)


def _camera_mats(cameras):
    full_proj = jnp.stack([cam.full_proj_transform for cam in cameras])
    inv_proj = jnp.linalg.inv(full_proj)
    heights = jnp.array([cam.image_height for cam in cameras], jnp.int32)
    widths = jnp.array([cam.image_width for cam in cameras], jnp.int32)
    return full_proj, inv_proj, heights, widths


def calculate_redundancy_metric(gaussians: GaussianModel,
                                cameras: CameraDataset,
                                pixel_scale: float = 1.0,
                                num_neighbours: int = 30):
    """Reference pruning/trainer.py:11-42, on live points only.

    One jitted program at capacity shape: the eager op-by-op version paid
    hundreds of per-op dispatches over the remote TPU tunnel (~30 s/event
    at 37k points measured on v5e; jitted it is tens of ms)."""
    n = gaussians.num_points
    min_red, cube = _metric_jit(
        gaussians.get_xyz, gaussians.get_scaling, gaussians.get_rotation,
        gaussians.alive_mask
        if gaussians.alive_mask is not None
        else jnp.ones((gaussians.get_xyz.shape[0],), bool),
        *_camera_mats(cameras), jnp.float32(pixel_scale), num_neighbours)
    return min_red[:n], cube[:n]


def mercy_points(model: GaussianModel, splatted_num_accum: jnp.ndarray,
                 lambda_mercy: float = 2.0, mercy_minimum: int = 2,
                 mercy_type: str = "redundancy_opacity",
                 rng: np.random.Generator = None) -> jnp.ndarray:
    """Reference pruning/trainer.py:45-68."""
    n = splatted_num_accum.shape[0]
    counts = splatted_num_accum.astype(jnp.float32)
    mean = jnp.mean(counts)
    std = jnp.sqrt(jnp.var(counts, ddof=1))
    threshold = jnp.maximum(mean + lambda_mercy * std, float(mercy_minimum))
    mask = counts > threshold
    opacity = model.get_opacity[:n, 0]

    if mercy_type == "redundancy_opacity":
        med = _masked_median(opacity, mask)
        mask = mask & (opacity < med)
    elif mercy_type == "redundancy_random":
        rng = rng or np.random.default_rng(0)
        rand = jnp.asarray(rng.random(n).astype(np.float32))
        mask = mask & (rand < 0.5)
    elif mercy_type == "opacity":
        thr = jnp.quantile(opacity, 0.045)
        mask = opacity < thr
    elif mercy_type == "redundancy_opacity_opacity":
        med = _masked_median(opacity, mask)
        mask = mask & (opacity < med)
        thr = jnp.minimum(jnp.quantile(opacity, 0.03), 0.05)
        mask = mask | (opacity < thr)
    else:
        raise ValueError(f"unknown mercy_type {mercy_type!r}")
    return mask


def _masked_median(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median of values[mask] (nan-free static-shape formulation)."""
    v = jnp.where(mask, values, jnp.nan)
    return jnp.nanmedian(v)


@partial(jax.jit, static_argnums=(10, 13))
def _mercy_jit(xyz, scaling, rotation, alive, full_proj, inv_proj,
               heights, widths, pixel_scale, opacity, k: int,
               lambda_mercy, mercy_minimum, mercy_type: str, rand,
               n_alive):
    """Full mercy-prune event (metric + policy) as ONE capacity-static
    program; statistics are computed over alive rows only (dead rows'
    metric values are garbage)."""
    min_red, _ = _metric_body(xyz, scaling, rotation, alive, full_proj,
                              inv_proj, heights, widths, pixel_scale, k)
    counts = min_red.astype(jnp.float32)
    na = jnp.maximum(n_alive.astype(jnp.float32), 1.0)
    mean = jnp.sum(jnp.where(alive, counts, 0.0)) / na
    var = (jnp.sum(jnp.where(alive, (counts - mean) ** 2, 0.0))
           / jnp.maximum(na - 1.0, 1.0))
    threshold = jnp.maximum(mean + lambda_mercy * jnp.sqrt(var),
                            mercy_minimum)
    mask = (counts > threshold) & alive
    op_alive = jnp.where(alive, opacity, jnp.nan)
    if mercy_type == "redundancy_opacity":
        med = _masked_median(opacity, mask)
        mask = mask & (opacity < med)
    elif mercy_type == "redundancy_random":
        mask = mask & (rand < 0.5)
    elif mercy_type == "opacity":
        thr = jnp.nanquantile(op_alive, 0.045)
        mask = (opacity < thr) & alive
    elif mercy_type == "redundancy_opacity_opacity":
        med = _masked_median(opacity, mask)
        mask = mask & (opacity < med)
        thr = jnp.minimum(jnp.nanquantile(op_alive, 0.03), 0.05)
        mask = (mask | (opacity < thr)) & alive
    else:
        raise ValueError(f"unknown mercy_type {mercy_type!r}")
    return mask


def mercy_gaussians(model: GaussianModel, dataset: CameraDataset,
                    box_size: float = 1.0, lambda_mercy: float = 1.0,
                    mercy_minimum: int = 3,
                    mercy_type: str = "redundancy_opacity",
                    rng: np.random.Generator = None) -> jnp.ndarray:
    c = model.capacity
    n = model.num_points
    alive = model.alive_mask
    if alive is None:
        alive = jnp.ones((c,), bool)
    if mercy_type == "redundancy_random":
        rng = rng or np.random.default_rng(0)
        rand = jnp.asarray(rng.random(c).astype(np.float32))
    else:
        rand = jnp.zeros((1,), jnp.float32)  # unused; keep cache stable
    mask = _mercy_jit(
        model.get_xyz, model.get_scaling, model.get_rotation, alive,
        *_camera_mats(dataset), jnp.float32(box_size),
        model.get_opacity[:, 0], 30, jnp.float32(lambda_mercy),
        jnp.float32(mercy_minimum), mercy_type, rand,
        jnp.int32(n))
    return mask[:n]


class BasePruner(OpacityPruner):
    """OpacityPruner + redundancy mercy prune (reference
    pruning/trainer.py:84-103): masks are OR-ed."""

    def __init__(self, base_densifier: AbstractDensifier,
                 dataset: CameraDataset,
                 box_size: float = 1.0,
                 lambda_mercy: float = 1.0,
                 mercy_minimum: int = 3,
                 mercy_type: str = "redundancy_opacity",
                 **configs):
        super().__init__(base_densifier, dataset, **configs)
        self.dataset = dataset
        self.box_size = box_size
        self.lambda_mercy = lambda_mercy
        self.mercy_minimum = mercy_minimum
        self.mercy_type = mercy_type

    def prune(self):
        remove_mask = mercy_gaussians(
            self.trainer.model, self.dataset, self.box_size,
            self.lambda_mercy, self.mercy_minimum, self.mercy_type)
        return np.asarray(super().prune()) | np.asarray(remove_mask)


def PruningDensifierWrapper(
        base_densifier_constructor: Callable[..., AbstractDensifier],
        model: GaussianModel, dataset: CameraDataset,
        box_size: float = 1.0,
        lambda_mercy: float = 1.0,
        mercy_minimum: int = 3,
        mercy_type: str = "redundancy_opacity",
        # defaults copied from OpacityPruner (reference :115-121)
        prune_from_iter: int = 1000,
        prune_until_iter: int = 15000,
        prune_interval: int = 100,
        prune_screensize_threshold: float = 20,
        prune_percent_too_big: float = 1,
        prune_opacity_threshold: float = 0.005,
        **configs):
    return BasePruner(
        base_densifier_constructor(model, dataset, **configs),
        dataset,
        box_size=box_size,
        lambda_mercy=lambda_mercy,
        mercy_minimum=mercy_minimum,
        mercy_type=mercy_type,
        prune_from_iter=prune_from_iter,
        prune_until_iter=prune_until_iter,
        prune_interval=prune_interval,
        prune_screensize_threshold=prune_screensize_threshold,
        prune_percent_too_big=prune_percent_too_big,
        prune_opacity_threshold=prune_opacity_threshold,
    )


def PruningTrainerWrapper(
        base_densifier_constructor: Callable[..., AbstractDensifier],
        model: GaussianModel, dataset: CameraDataset, **configs):
    return DensificationTrainer.from_densifier_constructor(
        partial(PruningDensifierWrapper, base_densifier_constructor),
        model, dataset, **configs)


def BasePruningTrainer(model: GaussianModel, dataset: CameraDataset, **configs):
    return PruningTrainerWrapper(
        lambda model, dataset, **cfg: NoopDensifier(model),
        model, dataset, **configs)
