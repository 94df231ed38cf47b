"""Trainable-camera wrapper.

Equivalent of the reference base package's CameraTrainerWrapper (used by the
`camera-*` modes, /root/reference/reduced_3dgs/combinations.py:163-252).
Each camera gets a learnable SE(3) delta (quaternion + translation) applied
in view space; the engine differentiates the render through the adjusted
matrices (our renderer is differentiable w.r.t. the camera transforms by
construction) and this wrapper applies its own Adam to the deltas.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..dataset.camera import Camera
from ..ops import projection as proj
from .abc import AbstractTrainer, TrainerWrapper
from .optimizer import adam_init, adam_update


def _apply_camera_delta(camera: Camera, cam_params) -> Camera:
    q = cam_params["rot"]
    q = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
    Rq = proj.quat_to_rotmat(q)                    # [3,3] column convention
    t = cam_params["trans"]
    # view-space delta: p_view' = p_view @ Rq^T + t  (row-vector storage)
    D = jnp.eye(4, dtype=jnp.float32)
    D = D.at[:3, :3].set(Rq.T)
    D = D.at[3, :3].set(t)
    world_view = camera.world_view_transform @ D
    # full_proj = world_view @ P; recover P from the original pair.
    P = jnp.linalg.solve(camera.world_view_transform, camera.full_proj_transform)
    full_proj = world_view @ P
    camera_center = jnp.linalg.inv(world_view)[3, :3]
    return camera.replace(world_view_transform=world_view,
                          full_proj_transform=full_proj,
                          camera_center=camera_center)


class CameraTrainer(TrainerWrapper):

    def __init__(self, base_trainer: AbstractTrainer, dataset=None,
                 camera_position_lr: float = 1e-4,
                 camera_rotation_lr: float = 1e-4):
        super().__init__(base_trainer)
        self.camera_dataset = dataset
        self.camera_position_lr = camera_position_lr
        self.camera_rotation_lr = camera_rotation_lr
        self._cam_params: Dict[int, dict] = {}
        self._cam_adam: Dict[int, object] = {}
        self._apply = _apply_camera_delta

    def _slot(self, camera: Camera) -> int:
        key = id(camera)
        if key not in self._cam_params:
            self._cam_params[key] = {
                "rot": jnp.array([1.0, 0, 0, 0], jnp.float32),
                "trans": jnp.zeros((3,), jnp.float32),
            }
            self._cam_adam[key] = adam_init(self._cam_params[key])
        return key

    # Engine hook ----------------------------------------------------------
    def camera_adjustment(self, camera: Camera):
        key = self._slot(camera)

        def consume_grads(grads):
            lr = {"rot": self.camera_rotation_lr,
                  "trans": self.camera_position_lr}
            new_p, new_s = adam_update(self._cam_params[key], grads,
                                       self._cam_adam[key], lr)
            self._cam_params[key] = jax.tree.map(lambda x: x, new_p)
            self._cam_adam[key] = new_s

        return self._cam_params[key], self._apply, consume_grads

    def adjusted_camera(self, camera: Camera) -> Camera:
        """The camera with its current learned delta applied (for eval)."""
        key = self._slot(camera)
        return self._apply(camera, self._cam_params[key])


def CameraTrainerWrapper(base_trainer_constructor, model, dataset,
                         camera_position_lr: float = 1e-4,
                         camera_rotation_lr: float = 1e-4,
                         **configs):
    return CameraTrainer(
        base_trainer_constructor(model, dataset, **configs), dataset,
        camera_position_lr=camera_position_lr,
        camera_rotation_lr=camera_rotation_lr)
