"""Top-level trainer combinations.

Mirrors /root/reference/reduced_3dgs/combinations.py: the named constructors
composing pruning + importance + SH-culling + opacity-reset + depth + camera
stacks. The flagship `densify-pruning-shculling` mode expands to

SHCuller(OpacityReset(Depth(DensificationTrainer(
    BasePruner(SplitClone(ImportancePruner(NoopDensifier)))))))

exactly like the reference (combinations.py:106-160 derivation).
"""
from __future__ import annotations

from functools import partial
from typing import Callable

from .dataset.dataset import CameraDataset, TrainableCameraDataset
from .models.gaussian_model import GaussianModel
from .trainer import (CameraTrainerWrapper, DensificationTrainer,
                      DepthTrainerWrapper, NoopDensifier,
                      OpacityResetDensificationTrainer,
                      OpacityResetTrainerWrapper)
from .trainer.densifier.abc import AbstractDensifier
from .importance import ImportancePruningDensifierWrapper
from .pruning import (PruningDensifierWrapper,
                      ReducedDensificationDensifierWrapper)
from .shculling import (SHCullingTrainer, SHCullingTrainerWrapper,
                        VariableSHGaussianModel,
                        CameraTrainableVariableSHGaussianModel)


def _noop(model, dataset, **configs):
    del dataset, configs
    return NoopDensifier(model)


# --- Full Pruning Trainer (reference combinations.py:12-55) -----------------

def FullPruningDensifierWrapper(base_densifier_constructor, model, dataset,
                                **configs) -> AbstractDensifier:
    return PruningDensifierWrapper(
        partial(ImportancePruningDensifierWrapper, base_densifier_constructor),
        model, dataset, **configs)


def FullPruningTrainerWrapper(base_densifier_constructor, model, dataset,
                              **configs):
    return DensificationTrainer.from_densifier_constructor(
        partial(FullPruningDensifierWrapper, base_densifier_constructor),
        model, dataset, **configs)


def BaseFullPruningTrainer(model: GaussianModel, dataset: CameraDataset,
                           **configs):
    return FullPruningTrainerWrapper(_noop, model, dataset, **configs)


def DepthFullPruningTrainer(model: GaussianModel,
                            dataset: TrainableCameraDataset, **configs):
    return DepthTrainerWrapper(BaseFullPruningTrainer, model, dataset,
                               **configs)


FullPruningTrainer = DepthFullPruningTrainer


# --- Full Reduced Densification Trainer (reference :58-114) -----------------

def FullReducedDensificationDensifierWrapper(base_densifier_constructor,
                                             model, dataset,
                                             **configs) -> AbstractDensifier:
    return ReducedDensificationDensifierWrapper(
        partial(ImportancePruningDensifierWrapper, base_densifier_constructor),
        model, dataset, **configs)


def FullReducedDensificationTrainerWrapper(base_densifier_constructor, model,
                                           dataset, **configs):
    return DensificationTrainer.from_densifier_constructor(
        partial(FullReducedDensificationDensifierWrapper,
                base_densifier_constructor),
        model, dataset, **configs)


def BaseFullReducedDensificationTrainer(model: GaussianModel,
                                        dataset: CameraDataset, **configs):
    return FullReducedDensificationTrainerWrapper(_noop, model, dataset,
                                                  **configs)


def DepthFullReducedDensificationTrainer(model: GaussianModel,
                                         dataset: TrainableCameraDataset,
                                         **configs):
    return DepthTrainerWrapper(BaseFullReducedDensificationTrainer, model,
                               dataset, **configs)


FullReducedDensificationTrainer = DepthFullReducedDensificationTrainer


def OpacityResetFullReducedDensificationTrainer(model: GaussianModel,
                                                dataset: CameraDataset,
                                                **configs):
    return OpacityResetTrainerWrapper(FullReducedDensificationTrainer, model,
                                      dataset, **configs)


# --- SH Culling wrapped trainers (reference :117-160) -----------------------

def SHCullingOpacityResetDensificationTrainer(
        model: VariableSHGaussianModel, dataset: CameraDataset, **configs):
    return SHCullingTrainerWrapper(OpacityResetDensificationTrainer, model,
                                   dataset, **configs)


def SHCullingFullPruningTrainer(model: VariableSHGaussianModel,
                                dataset: CameraDataset, **configs):
    return SHCullingTrainerWrapper(FullPruningTrainer, model, dataset,
                                   **configs)


def SHCullingFullReducedDensificationTrainer(model: VariableSHGaussianModel,
                                             dataset: CameraDataset, **configs):
    return SHCullingTrainerWrapper(FullReducedDensificationTrainer, model,
                                   dataset, **configs)


def SHCullingOpacityResetFullReducedDensificationTrainer(
        model: VariableSHGaussianModel, dataset: CameraDataset, **configs):
    return SHCullingTrainerWrapper(
        OpacityResetFullReducedDensificationTrainer, model, dataset, **configs)


# --- Camera wrapped trainers (reference :163-252) ---------------------------

def CameraSHCullingTrainer(model: CameraTrainableVariableSHGaussianModel,
                           dataset: TrainableCameraDataset, **configs):
    return CameraTrainerWrapper(SHCullingTrainer, model, dataset, **configs)


def CameraFullPruningTrainer(model, dataset: TrainableCameraDataset, **configs):
    return CameraTrainerWrapper(FullPruningTrainer, model, dataset, **configs)


def CameraFullReducedDensificationTrainer(model,
                                          dataset: TrainableCameraDataset,
                                          **configs):
    return CameraTrainerWrapper(FullReducedDensificationTrainer, model,
                                dataset, **configs)


def CameraOpacityResetFullReducedDensificationTrainer(
        model, dataset: TrainableCameraDataset, **configs):
    return CameraTrainerWrapper(OpacityResetFullReducedDensificationTrainer,
                                model, dataset, **configs)


def CameraSHCullingOpacityResetDensificationTrainer(
        model, dataset: TrainableCameraDataset, **configs):
    return CameraTrainerWrapper(SHCullingOpacityResetDensificationTrainer,
                                model, dataset, **configs)


def CameraSHCullingFullPruningTrainer(model, dataset: TrainableCameraDataset,
                                      **configs):
    return CameraTrainerWrapper(SHCullingFullPruningTrainer, model, dataset,
                                **configs)


def CameraSHCullingFullReducedDensificationTrainer(
        model, dataset: TrainableCameraDataset, **configs):
    return CameraTrainerWrapper(SHCullingFullReducedDensificationTrainer,
                                model, dataset, **configs)


def CameraSHCullingOpacityResetFullReducedDensificationTrainer(
        model, dataset: TrainableCameraDataset, **configs):
    return CameraTrainerWrapper(
        SHCullingOpacityResetFullReducedDensificationTrainer, model, dataset,
        **configs)
