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

    # ------------------------------------------------- fused window stepping
    def fires_at(self, step: int) -> bool:
        """Would this wrapper's hooks (optim_step / model-property) do REAL
        work when fired with curr_step == `step`? Window batching
        (step_many) fuses k steps into one jitted program and fires the
        hook chain only at the window's final step, so a window may not
        contain an interior step where this returns True. Wrappers that
        override optim_step (or hook the model property) MUST override this
        to report their cadence, or the conservative default disables
        batching across them. The base AbstractTrainer has no hooks."""
        return False

    def max_window(self, k_max: int) -> int:
        """Largest k <= k_max such that fusing steps
        [curr_step+1, curr_step+k] fires no interior hook and crosses no
        engine schedule boundary (the final step's hooks fire normally)."""
        t0 = self.curr_step
        engine = self.engine
        k = 1
        while (k < k_max and not self.fires_at(t0 + k)
               and not engine.advances_at(t0 + k)):
            k += 1
        return k

    def step_many(self, cameras) -> Tuple:
        """Fused multi-step window: run len(cameras) steps as ONE jitted
        program (engine.update_many), then fire the hook chain once at the
        window's final step. The caller sizes the window with max_window()
        so no interior step needed a hook. Returns (losses, ys) where
        losses is a length-k list of per-step device scalars and ys holds
        stacked per-step metrics (loss, and psnr/masked_psnr when the
        cameras carry ground truth)."""
        model = self.model  # property access — quantize wrappers hook here
        del model
        losses, ys = self.engine.update_many(self, cameras)
        self._last_step_io = (losses[-1], None, cameras[-1])
        self.optim_step()
        return losses, ys

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

    def fires_at(self, step: int) -> bool:
        # Safe-by-construction: a wrapper subclass that overrides a hook
        # surface (optim_step or the model property) without declaring its
        # cadence via fires_at disables window batching across itself —
        # correctness over speed for third-party wrappers.
        cls = type(self)
        own_hooks = (cls.optim_step is not TrainerWrapper.optim_step
                     or cls.model is not TrainerWrapper.model)
        if own_hooks and cls.fires_at is TrainerWrapper.fires_at:
            return True
        return self.base_trainer.fires_at(step)
