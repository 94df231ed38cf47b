"""Rendered-importance pruning.

TPU-native equivalent of /root/reference/reduced_3dgs/importance/trainer.py.
The reference uses a forked rasterizer (submodules/gaussian-importance) whose
counting kernel accumulates, per Gaussian and contributing blend event,
(count += 1, opacity_score += opacity, T_alpha_score += alpha*T)
(its forward.cu:473-476). Our single renderer produces the same statistics
via the with_stats flag (deterministic segment-sums instead of atomicAdd).

All scoring policies and defaults match the reference: prune_types
important_score / v_important_score / max_v_important_score / count /
T_alpha / T_alpha_avg / comprehensive; defaults at trainer.py:188-200.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from ..dataset.camera import Camera, build_camera
from ..dataset.dataset import CameraDataset
from ..models.gaussian_model import GaussianModel
from ..trainer import (AbstractDensifier, DensificationTrainer,
                       DensifierWrapper, NoopDensifier)


def count_render(model: GaussianModel, camera: Camera) -> dict:
    """Render with importance counters (reference count_render, :13-77)."""
    out = model.forward(camera, with_stats=True)
    return {
        "render": out["render"],
        "visibility_filter": out["radii"] > 0,
        "radii": out["radii"],
        "gaussians_count": out["gaussians_count"],
        "opacity_important_score": out["opacity_important_score"],
        "T_alpha_important_score": out["T_alpha_important_score"],
    }


def prune_list(model: GaussianModel, dataset: CameraDataset,
               resize: Optional[int] = None, mesh=None):
    """Sum the counters over every camera (reference :80-98).

    With `mesh` (a ("data","tile") jax.sharding.Mesh, as used by
    parallel.ShardedTrainer), the sweep runs sharded: cameras across the
    data axis, pixel bands across the tile axis (parallel/stats.py)."""
    if mesh is not None:
        from ..parallel.stats import sharded_prune_list
        return sharded_prune_list(model, dataset, mesh, resize)
    cams = []
    for camera in dataset:
        if resize is not None:
            height, width = camera.image_height, camera.image_width
            scale = resize / max(height, width)
            camera = build_camera(
                image_height=int(height * scale), image_width=int(width * scale),
                FoVx=float(camera.FoVx), FoVy=float(camera.FoVy),
                R=camera.R, T=camera.T)
        cams.append(camera)

    from ..dataset.camera import stack_cameras, stackable
    m = model.num_points
    if len(cams) > 1 and stackable(cams):
        # ONE jitted scan over the stacked dataset: the per-camera loop
        # paid a remote-tunnel round trip PER CAMERA (~25 ms on the axon
        # v5e link — the overflow check in model.forward is a host sync),
        # which dominated the 6x250-camera importance sweeps.
        gc, osc, tas = _sweep_counts(model, cams)
        return gc[:m], osc[:m], tas[:m]

    n = model.capacity
    gaussian_count = jnp.zeros((n,), jnp.int32)
    opacity_score = jnp.zeros((n,), jnp.float32)
    t_alpha_score = jnp.zeros((n,), jnp.float32)
    for camera in cams:
        out = count_render(model, camera)
        gaussian_count = gaussian_count + out["gaussians_count"]
        opacity_score = opacity_score + out["opacity_important_score"]
        t_alpha_score = t_alpha_score + out["T_alpha_important_score"]
    return gaussian_count[:m], opacity_score[:m], t_alpha_score[:m]


_SWEEP_CACHE: "weakref.WeakKeyDictionary" = None


def _sweep_counts(model: GaussianModel, cams):
    """Scanned counting sweep with end-of-sweep overflow regrow."""
    global _SWEEP_CACHE
    import weakref
    import jax
    from ..dataset.camera import stack_cameras
    from ..models.gaussian_model import default_key_buffer_size

    if _SWEEP_CACHE is None:
        _SWEEP_CACHE = weakref.WeakKeyDictionary()
    per_model = _SWEEP_CACHE.setdefault(model, {})

    cam0 = cams[0]
    stacked = stack_cameras(cams)
    aux = model.aux_state()
    alive = model.alive_mask
    while True:
        kb = model._key_buffer_size
        key = (kb, alive is not None,
               (cam0.image_height, cam0.image_width),
               model.active_sh_degree)
        fn = per_model.get(key)
        if fn is None:
            @jax.jit
            def fn(params, aux, cams_st, alive):
                n = params["xyz"].shape[0]
                init = (jnp.zeros((n,), jnp.int32),
                        jnp.zeros((n,), jnp.float32),
                        jnp.zeros((n,), jnp.float32),
                        jnp.zeros((), bool))
                def body(carry, cam):
                    out = model.render(params, cam, aux=aux, alive=alive,
                                       with_stats=True, key_buffer_size=kb)
                    gc, osc, tas, ovf = carry
                    ovf = ovf | jnp.asarray(
                        out.get("overflow", False), bool)
                    return (gc + out["gaussians_count"],
                            osc + out["opacity_important_score"],
                            tas + out["T_alpha_important_score"], ovf), None
                return jax.lax.scan(body, init, cams_st)[0]
            per_model[key] = fn
        gc, osc, tas, ovf = fn(model.parameters(), aux, stacked, alive)
        if not bool(ovf):
            return gc, osc, tas
        # same doubling policy as GaussianModel.forward
        tiles = ((-(-cam0.image_width // 16))
                 * (-(-cam0.image_height // 16)))
        cur = kb or default_key_buffer_size(
            model.capacity, -(-cam0.image_width // 16),
            -(-cam0.image_height // 16))
        model._key_buffer_size = min(cur * 2,
                                     max(model.num_points, 1) * tiles)


def calculate_v_imp_score(gaussians: GaussianModel, imp_list, v_pow: float):
    """Volume-adaptive importance (reference :102-118): multiply by
    (volume / 90th-percentile-volume)^v_pow."""
    n = imp_list.shape[0]
    volume = jnp.prod(gaussians.get_scaling[:n], axis=1)
    sorted_volume = jnp.sort(volume)[::-1]
    index = int(n * 0.9)
    kth_percent_largest = sorted_volume[min(index, n - 1)]
    v_list = jnp.power(volume / kth_percent_largest, v_pow)
    return v_list * imp_list


def score2mask(percent: float, import_score, threshold=None):
    """Prune everything at or below min(threshold, nth-percentile value)
    (reference :121-127)."""
    score = jnp.asarray(import_score, jnp.float32)
    sorted_tensor = jnp.sort(score)
    index = int(percent * (score.shape[0] - 1))
    value_nth_percentile = sorted_tensor[index]
    thr = (jnp.minimum(threshold, value_nth_percentile)
           if threshold is not None else value_nth_percentile)
    return score <= thr


def prune_gaussians(
        gaussians: GaussianModel, dataset: CameraDataset,
        resize: Optional[int] = None,
        prune_type: str = "comprehensive",
        prune_percent: float = 0.1,
        prune_thr_important_score=None,
        prune_thr_v_important_score=None,
        prune_thr_max_v_important_score=None,
        prune_thr_count=None,
        prune_thr_T_alpha=None,
        prune_thr_T_alpha_avg=None,
        v_pow: float = 0.1,
        mesh=None):
    """Reference :130-181; returns an [N] bool removal mask."""
    gaussian_list, opacity_imp_list, T_alpha_imp_list = prune_list(
        gaussians, dataset, resize, mesh=mesh)
    glist = gaussian_list.astype(jnp.float32)

    def t_alpha_avg():
        v = jnp.where(glist > 0, T_alpha_imp_list / jnp.maximum(glist, 1), 0.0)
        return v

    if prune_type == "important_score":
        return score2mask(prune_percent, opacity_imp_list, prune_thr_important_score)
    if prune_type == "v_important_score":
        v_list = calculate_v_imp_score(gaussians, opacity_imp_list, v_pow)
        return score2mask(prune_percent, v_list, prune_thr_v_important_score)
    if prune_type == "max_v_important_score":
        n = opacity_imp_list.shape[0]
        v_list = opacity_imp_list * jnp.max(gaussians.get_scaling[:n], axis=1)
        return score2mask(prune_percent, v_list, prune_thr_max_v_important_score)
    if prune_type == "count":
        return score2mask(prune_percent, glist, prune_thr_count)
    if prune_type == "T_alpha":
        return score2mask(prune_percent, T_alpha_imp_list, prune_thr_T_alpha)
    if prune_type == "T_alpha_avg":
        return score2mask(prune_percent, t_alpha_avg(), prune_thr_T_alpha_avg)
    if prune_type == "comprehensive":
        mask = jnp.zeros(glist.shape, bool)
        if prune_thr_important_score is not None:
            mask |= score2mask(prune_percent, opacity_imp_list,
                               prune_thr_important_score)
        if prune_thr_v_important_score is not None:
            v_list = calculate_v_imp_score(gaussians, opacity_imp_list, v_pow)
            mask |= score2mask(prune_percent, v_list, prune_thr_v_important_score)
        if prune_thr_max_v_important_score is not None:
            n = opacity_imp_list.shape[0]
            v_list = opacity_imp_list * jnp.max(gaussians.get_scaling[:n], axis=1)
            mask |= score2mask(prune_percent, v_list,
                               prune_thr_max_v_important_score)
        if prune_thr_count is not None:
            mask |= score2mask(prune_percent, glist, prune_thr_count)
        if prune_thr_T_alpha is not None:
            mask |= score2mask(prune_percent, T_alpha_imp_list, prune_thr_T_alpha)
        if prune_thr_T_alpha_avg is not None:
            mask |= score2mask(prune_percent, t_alpha_avg(), prune_thr_T_alpha_avg)
        return mask
    raise ValueError(f"Unsupported pruning method {prune_type!r}")


class ImportancePruner(DensifierWrapper):
    """Runs importance pruning every `importance_prune_interval` steps inside
    [from_iter, until_iter] (defaults 15000..20000 every 1000; reference
    :184-229)."""

    def __init__(
            self, base_densifier: AbstractDensifier,
            dataset: CameraDataset,
            importance_prune_from_iter: int = 15000,
            importance_prune_until_iter: int = 20000,
            importance_prune_interval: int = 1000,
            importance_score_resize: Optional[int] = None,
            importance_prune_type: str = "comprehensive",
            importance_prune_percent: float = 0.1,
            importance_prune_thr_important_score=None,
            importance_prune_thr_v_important_score: float = 3.0,
            importance_prune_thr_max_v_important_score=None,
            importance_prune_thr_count: float = 1,
            importance_prune_thr_T_alpha: float = 1,
            importance_prune_thr_T_alpha_avg: float = 0.001,
            importance_v_pow: float = 0.1):
        super().__init__(base_densifier)
        self.dataset = dataset
        self.importance_prune_from_iter = importance_prune_from_iter
        self.importance_prune_until_iter = importance_prune_until_iter
        self.importance_prune_interval = importance_prune_interval
        self.resize = importance_score_resize
        self.prune_type = importance_prune_type
        self.prune_percent = importance_prune_percent
        self.prune_thr_important_score = importance_prune_thr_important_score
        self.prune_thr_v_important_score = importance_prune_thr_v_important_score
        self.prune_thr_max_v_important_score = importance_prune_thr_max_v_important_score
        self.prune_thr_count = importance_prune_thr_count
        self.prune_thr_T_alpha = importance_prune_thr_T_alpha
        self.prune_thr_T_alpha_avg = importance_prune_thr_T_alpha_avg
        self.v_pow = importance_v_pow

    def densify_and_prune(self, loss, out, camera, step: int):
        ret = super().densify_and_prune(loss, out, camera, step)
        if (self.importance_prune_from_iter <= step
                <= self.importance_prune_until_iter
                and step % self.importance_prune_interval == 0):
            # When training is sharded, sweep sharded over the same mesh.
            mesh = (getattr(self.trainer.engine, "mesh", None)
                    if self.trainer is not None else None)
            remove_mask = prune_gaussians(
                self.trainer.model, self.dataset, self.resize,
                self.prune_type, self.prune_percent,
                self.prune_thr_important_score,
                self.prune_thr_v_important_score,
                self.prune_thr_max_v_important_score,
                self.prune_thr_count,
                self.prune_thr_T_alpha,
                self.prune_thr_T_alpha_avg,
                self.v_pow,
                mesh=mesh)
            ret = ret.merge_remove(remove_mask)
        return ret

    def fires_at(self, step: int) -> bool:
        return ((self.importance_prune_from_iter <= step
                 <= self.importance_prune_until_iter
                 and step % self.importance_prune_interval == 0)
                or super().fires_at(step))


def ImportancePruningDensifierWrapper(
        base_densifier_constructor: Callable[..., AbstractDensifier],
        model: GaussianModel, dataset: CameraDataset, **configs):
    keys = ("importance_prune_from_iter", "importance_prune_until_iter",
            "importance_prune_interval", "importance_score_resize",
            "importance_prune_type", "importance_prune_percent",
            "importance_prune_thr_important_score",
            "importance_prune_thr_v_important_score",
            "importance_prune_thr_max_v_important_score",
            "importance_prune_thr_count", "importance_prune_thr_T_alpha",
            "importance_prune_thr_T_alpha_avg", "importance_v_pow")
    own = {k: configs.pop(k) for k in keys if k in configs}
    return ImportancePruner(
        base_densifier_constructor(model, dataset, **configs), dataset, **own)


def ImportancePruningTrainerWrapper(
        base_densifier_constructor: Callable[..., AbstractDensifier],
        model: GaussianModel, dataset: CameraDataset, **configs):
    return DensificationTrainer.from_densifier_constructor(
        partial(ImportancePruningDensifierWrapper, base_densifier_constructor),
        model, dataset, **configs)


def BaseImportancePruningTrainer(model: GaussianModel, dataset: CameraDataset,
                                 **configs):
    return ImportancePruningTrainerWrapper(
        lambda model, dataset, **cfg: NoopDensifier(model),
        model, dataset, **configs)
