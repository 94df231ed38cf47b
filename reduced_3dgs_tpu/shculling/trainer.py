"""SH band culling.

TPU-native equivalent of /root/reference/reduced_3dgs/shculling/trainer.py:
at `cull_at_steps` (default [15000]) compute transmittance-weighted colour
statistics over ALL cameras, then
  1. low-variance culling (trainer.py:10-22): weighted colour std below
     `std_threshold` (0.04) -> degree 0, bake the weighted mean into DC via
     (mean - 0.5)/SH_C0, zero the rest;
  2. low-distance culling (trainer.py:25-40): for bands from high to low,
     weighted colour distance below `cdist_threshold` (6) -> cap the degree
     and zero the now-unused coefficients.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..dataset.dataset import CameraDataset
from ..ops.sh import SH_C0
from ..ops.shculling_stats import calculate_colours_variance
from ..trainer import AbstractTrainer, BaseTrainer, Trainer, TrainerWrapper
from .gaussian_model import VariableSHGaussianModel


def _low_variance_colour_culling(degrees, features_dc, features_rest,
                                 threshold, weighted_variance, weighted_mean):
    """Reference trainer.py:10-22 as a pure function."""
    std = jnp.sqrt(weighted_variance)
    std = jnp.where(jnp.isnan(std), 0.0, std)
    std = jnp.mean(std, axis=2)[:, 0]                   # [N]
    mask = std < threshold
    new_dc = (weighted_mean - 0.5) / SH_C0              # [N,1,3]
    features_dc = jnp.where(mask[:, None, None], new_dc, features_dc)
    degrees = jnp.where(mask, 0, degrees)
    features_rest = jnp.where(mask[:, None, None], 0.0, features_rest)
    return degrees, features_dc, features_rest


def _low_distance_colour_culling(degrees, features_rest, threshold,
                                 colour_distances, active_sh_degree):
    """Reference trainer.py:25-40 as a pure function."""
    colour_distances = jnp.where(jnp.isnan(colour_distances), 0.0,
                                 colour_distances)
    n_rest = features_rest.shape[1]
    coeff_idx = jnp.arange(n_rest)
    for sh_degree in range(active_sh_degree - 1, 0, -1):
        coeffs_num = (sh_degree + 1) ** 2 - 1
        mask = colour_distances[:, sh_degree] < threshold
        degrees = jnp.where(mask, jnp.minimum(sh_degree, degrees), degrees)
        zero_rows = mask[:, None] & (coeff_idx >= coeffs_num)[None, :]
        features_rest = jnp.where(zero_rows[..., None], 0.0, features_rest)
    return degrees, features_rest


def cull_sh_bands(model: VariableSHGaussianModel, cameras: CameraDataset,
                  threshold: float = 0, std_threshold: float = 0.0,
                  mesh=None):
    """Reference trainer.py:43-80 (runs statistics twice, like the original:
    the first culling changes values the second pass must see).

    With `mesh`, both statistics sweeps run sharded over the ("data",
    "tile") mesh (parallel/stats.py)."""
    params = model.parameters()
    degrees = model.aux_state()["degrees"]
    alive = model.alive_mask

    if mesh is not None:
        from ..parallel.stats import sharded_colours_variance
        stats_fn = lambda *a: sharded_colours_variance(*a, mesh=mesh)
    else:
        stats_fn = calculate_colours_variance

    _, weighted_variance, weighted_mean = stats_fn(
        cameras, model, params, degrees, model.active_sh_degree, alive)
    degrees, f_dc, f_rest = _low_variance_colour_culling(
        degrees, params["features_dc"], params["features_rest"],
        std_threshold, weighted_variance, weighted_mean)
    params = dict(params, features_dc=f_dc, features_rest=f_rest)

    colour_distances, _, _ = stats_fn(
        cameras, model, params, degrees, model.active_sh_degree, alive)
    degrees, f_rest = _low_distance_colour_culling(
        degrees, params["features_rest"], threshold, colour_distances,
        model.active_sh_degree)
    params = dict(params, features_rest=f_rest)

    if alive is not None:
        keep = alive
        degrees = jnp.where(keep, degrees, 0)
    model.set_parameters(params)
    model.aux_set({"degrees": degrees})
    return model


class SHCuller(TrainerWrapper):
    """Fires the cull at `cull_at_steps` (reference trainer.py:83-102)."""

    def __init__(self, base_trainer: AbstractTrainer, dataset: CameraDataset,
                 cdist_threshold: float = 6,
                 std_threshold: float = 0.04,
                 cull_at_steps=(15000,)):
        super().__init__(base_trainer)
        assert isinstance(self.model, VariableSHGaussianModel), (
            "SHCuller requires a VariableSHGaussianModel")
        self.dataset = dataset
        self.cdist_threshold = cdist_threshold
        self.std_threshold = std_threshold
        self.cull_at_steps = list(cull_at_steps)

    def optim_step(self):
        ret = super().optim_step()
        if self.curr_step in self.cull_at_steps:
            cull_sh_bands(self.model, self.dataset, self.cdist_threshold,
                          self.std_threshold,
                          mesh=getattr(self.engine, "mesh", None))
        return ret

    def fires_at(self, step: int) -> bool:
        return step in self.cull_at_steps or super().fires_at(step)


def SHCullingTrainerWrapper(base_trainer_constructor,
                            model: VariableSHGaussianModel,
                            dataset: CameraDataset,
                            cdist_threshold: float = 6,
                            std_threshold: float = 0.04,
                            cull_at_steps=(15000,),
                            **configs):
    return SHCuller(
        base_trainer_constructor(model, dataset, **configs), dataset,
        cdist_threshold=cdist_threshold, std_threshold=std_threshold,
        cull_at_steps=cull_at_steps)


def BaseSHCullingTrainer(model: VariableSHGaussianModel,
                         dataset: CameraDataset, **configs):
    return SHCullingTrainerWrapper(BaseTrainer, model, dataset, **configs)


def SHCullingTrainer(model: VariableSHGaussianModel,
                     dataset: CameraDataset, **configs):
    return SHCullingTrainerWrapper(Trainer, model, dataset, **configs)
