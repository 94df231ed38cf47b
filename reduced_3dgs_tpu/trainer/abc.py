"""Trainer abstractions: the wrapper-onion composition pattern.

Mirrors the reference base package's AbstractTrainer / TrainerWrapper
contract (usage: /root/reference/reduced_3dgs/shculling/trainer.py:3,83-102;
quantization/abc.py:29-49): `step(camera) -> (loss, out)`, an `optim_step`
hook chain, a `model` property that wrappers may intercept, and `curr_step`.

Execution model (TPU-functional redesign): the innermost `BaseTrainer` is the
"engine" owning parameters, optimizer state and the jitted update; wrappers
compose *pure* loss terms (`loss_pure`) and post-update hooks (`optim_step`).
`step` is a template method defined once here: it resolves the outermost
composed loss, runs the engine's fused grad+Adam update, then fires the hook
chain — preserving the reference's wrapper semantics without giving up a
single fused XLA step.
"""
from __future__ import annotations

import abc
from typing import Tuple


class AbstractTrainer(abc.ABC):

    @property
    @abc.abstractmethod
    def engine(self) -> "AbstractTrainer":
        """The innermost BaseTrainer owning state."""

    @property
    @abc.abstractmethod
    def model(self):
        ...

    @property
    @abc.abstractmethod
    def curr_step(self) -> int:
        ...

    @curr_step.setter
    def curr_step(self, v: int):
        raise NotImplementedError

    @abc.abstractmethod
    def loss_pure(self):
        """Return the pure loss fn:
        (params, aux, render_out, camera, extras) -> scalar.

        Must be stable across steps (jit cache key). Step-dependent scalars
        (e.g. decaying loss weights) flow through `extras` (see
        loss_scalars) so they never trigger recompiles."""

    def loss_scalars(self) -> dict:
        """Traced scalar inputs for loss_pure, merged across the onion."""
        return {}

    def camera_adjustment(self, camera):
        """Optional trainable-camera hook: return
        (cam_params pytree, apply_fn(camera, cam_params) -> camera,
        consume_grads_fn) or None (see CameraTrainer)."""
        return None

    def optim_step(self):
        """Post-update hook chain; wrappers call super().optim_step() first."""
        return None

    def step(self, camera) -> Tuple:
        """One training step (reference AbstractTrainer.step contract)."""
        model = self.model  # property access — quantize wrappers hook here
        del model
        loss, out = self.engine.update(self, camera)
        self._last_step_io = (loss, out, camera)
        self.optim_step()
        return loss, out

    # convenience used by hook implementations
    @property
    def last_step_io(self):
        return getattr(self.engine, "_last_step_io_engine", None)


class TrainerWrapper(AbstractTrainer):
    """Delegating wrapper (reference TrainerWrapper contract)."""

    def __init__(self, base_trainer: AbstractTrainer):
        self.base_trainer = base_trainer

    @property
    def engine(self):
        return self.base_trainer.engine

    @property
    def model(self):
        return self.base_trainer.model

    @property
    def curr_step(self) -> int:
        return self.base_trainer.curr_step

    @curr_step.setter
    def curr_step(self, v: int):
        self.base_trainer.curr_step = v

    def loss_pure(self):
        return self.base_trainer.loss_pure()

    def loss_scalars(self) -> dict:
        return self.base_trainer.loss_scalars()

    def camera_adjustment(self, camera):
        return self.base_trainer.camera_adjustment(camera)

    def optim_step(self):
        return self.base_trainer.optim_step()
