"""Trainer wrapper extensions: opacity reset, depth supervision, scale
regularization, trainable cameras.

Equivalents of the reference base package wrappers imported at
/root/reference/reduced_3dgs/combinations.py:5 and prepare.py:6:
OpacityResetTrainerWrapper, DepthTrainerWrapper, ScaleRegularizeTrainerWrapper,
CameraTrainerWrapper. Their exact internals live in the non-vendored base
package; behavior here follows the vanilla-3DGS conventions those wrappers
encapsulate (opacity reset every 3000 steps to <= 0.01; depth L1 with a
decaying weight; anisotropy regularization on scales; per-camera pose deltas
optimized jointly with the scene).
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from ..models.gaussian_model import inverse_sigmoid
from .abc import AbstractTrainer, TrainerWrapper
from .optimizer import AdamState


class OpacityResetter(TrainerWrapper):
    """Clamp all opacities to <= reset value every `opacity_reset_interval`
    steps (vanilla reset_opacity), zeroing the opacity Adam moments."""

    def __init__(self, base_trainer: AbstractTrainer,
                 opacity_reset_interval: int = 3000,
                 opacity_reset_value: float = 0.01,
                 opacity_reset_until_iter: int = 15000):
        super().__init__(base_trainer)
        self.opacity_reset_interval = opacity_reset_interval
        self.opacity_reset_value = opacity_reset_value
        self.opacity_reset_until_iter = opacity_reset_until_iter

    def optim_step(self):
        ret = super().optim_step()
        step = self.curr_step
        if (step % self.opacity_reset_interval == 0
                and 0 < step <= self.opacity_reset_until_iter):
            engine = self.engine
            params = engine.model.parameters()
            op = params["opacity"]
            new_op = inverse_sigmoid(
                jnp.minimum(jax.nn.sigmoid(op), self.opacity_reset_value))
            params = dict(params)
            params["opacity"] = new_op
            engine.model.set_parameters(params)
            adam = engine.adam
            m = dict(adam.m)
            v = dict(adam.v)
            m["opacity"] = jnp.zeros_like(m["opacity"])
            v["opacity"] = jnp.zeros_like(v["opacity"])
            engine.adam = AdamState(count=adam.count, m=m, v=v)
        return ret

    def fires_at(self, step: int) -> bool:
        return ((step % self.opacity_reset_interval == 0
                 and 0 < step <= self.opacity_reset_until_iter)
                or super().fires_at(step))


def OpacityResetTrainerWrapper(base_trainer_constructor, model, dataset,
                               opacity_reset_interval: int = 3000,
                               opacity_reset_value: float = 0.01,
                               opacity_reset_until_iter: int = 15000,
                               **configs):
    return OpacityResetter(
        base_trainer_constructor(model, dataset, **configs),
        opacity_reset_interval=opacity_reset_interval,
        opacity_reset_value=opacity_reset_value,
        opacity_reset_until_iter=opacity_reset_until_iter)


class DepthSupervisor(TrainerWrapper):
    """Adds a depth-L1 term on the renderer's expected-depth output against
    camera.ground_truth_depth (ignored when the camera has no depth)."""

    def __init__(self, base_trainer: AbstractTrainer,
                 depth_l1_weight_init: float = 1.0,
                 depth_l1_weight_final: float = 0.01,
                 depth_l1_weight_max_steps: int = 30000):
        super().__init__(base_trainer)
        base = self.base_trainer.loss_pure()
        import math
        log_wi = math.log(max(depth_l1_weight_init, 1e-30))
        log_wf = math.log(max(depth_l1_weight_final, 1e-30))
        max_steps = depth_l1_weight_max_steps

        def with_depth(params, aux, out, camera, extras):
            loss = base(params, aux, out, camera, extras)
            if camera.ground_truth_depth is not None:
                # Decay weight computed in-graph from the engine's traced
                # step counter (extras["step"]) — matches get_expon_lr_func
                # with no delay; avoids a per-step host scalar transfer.
                t = jnp.clip(extras["step"].astype(jnp.float32) / max_steps,
                             0.0, 1.0)
                weight = jnp.exp(log_wi * (1.0 - t) + log_wf * t)
                alpha = 1.0 - out["final_T"]
                depth = out["depth"] / jnp.maximum(alpha, 1e-6)
                valid = camera.ground_truth_depth > 0
                err = jnp.abs(depth - camera.ground_truth_depth)
                err = jnp.where(valid & (alpha > 0.5), err, 0.0)
                denom = jnp.maximum(jnp.sum(valid), 1)
                loss = loss + weight * jnp.sum(err) / denom
            return loss

        self._loss = with_depth

    def loss_pure(self):
        return self._loss


def DepthTrainerWrapper(base_trainer_constructor, model, dataset,
                        depth_l1_weight_init: float = 1.0,
                        depth_l1_weight_final: float = 0.01,
                        depth_l1_weight_max_steps: int = 30000,
                        **configs):
    return DepthSupervisor(
        base_trainer_constructor(model, dataset, **configs),
        depth_l1_weight_init=depth_l1_weight_init,
        depth_l1_weight_final=depth_l1_weight_final,
        depth_l1_weight_max_steps=depth_l1_weight_max_steps)


class ScaleRegularizer(TrainerWrapper):
    """Anisotropy penalty: mean(max_scale/min_scale - ratio_cap clamped below
    at 0). Discourages needle Gaussians (opt-in --with_scale_reg)."""

    def __init__(self, base_trainer: AbstractTrainer,
                 scale_reg_weight: float = 0.01,
                 scale_reg_max_ratio: float = 10.0):
        super().__init__(base_trainer)
        base = self.base_trainer.loss_pure()
        cap = scale_reg_max_ratio
        w = scale_reg_weight

        def with_reg(params, aux, out, camera, extras):
            loss = base(params, aux, out, camera, extras)
            s = jnp.exp(params["scaling"])
            ratio = jnp.max(s, axis=1) / jnp.maximum(jnp.min(s, axis=1), 1e-12)
            return loss + w * jnp.mean(jnp.maximum(ratio - cap, 0.0))

        self._loss = with_reg

    def loss_pure(self):
        return self._loss


def ScaleRegularizeTrainerWrapper(base_trainer_constructor, model, dataset,
                                  scale_reg_weight: float = 0.01,
                                  scale_reg_max_ratio: float = 10.0,
                                  **configs):
    return ScaleRegularizer(
        base_trainer_constructor(model, dataset, **configs),
        scale_reg_weight=scale_reg_weight,
        scale_reg_max_ratio=scale_reg_max_ratio)
