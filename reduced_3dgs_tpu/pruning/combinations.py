"""Pruning trainer combinations (mirrors
/root/reference/reduced_3dgs/pruning/combinations.py)."""
from __future__ import annotations

from functools import partial
from typing import Callable

from ..dataset.dataset import CameraDataset, TrainableCameraDataset
from ..models.gaussian_model import GaussianModel
from ..trainer import (AbstractDensifier, DensificationTrainer,
                       DepthTrainerWrapper, NoopDensifier,
                       SplitCloneDensifierWrapper)
from .trainer import BasePruningTrainer, PruningDensifierWrapper


def DepthPruningTrainer(model: GaussianModel, dataset: TrainableCameraDataset,
                        **configs):
    return DepthTrainerWrapper(BasePruningTrainer, model, dataset, **configs)


PruningTrainer = DepthPruningTrainer


def ReducedDensificationDensifierWrapper(
        base_densifier_constructor: Callable[..., AbstractDensifier],
        model: GaussianModel, dataset: CameraDataset,
        **configs) -> AbstractDensifier:
    """Mercy pruning + vanilla clone/split (reference
    pruning/combinations.py:21-29)."""
    return PruningDensifierWrapper(
        partial(SplitCloneDensifierWrapper, base_densifier_constructor),
        model, dataset, **configs)


def ReducedDensificationTrainerWrapper(
        base_densifier_constructor: Callable[..., AbstractDensifier],
        model: GaussianModel, dataset: CameraDataset, **configs):
    return DensificationTrainer.from_densifier_constructor(
        partial(ReducedDensificationDensifierWrapper, base_densifier_constructor),
        model, dataset, **configs)


def BaseReducedDensificationTrainer(model: GaussianModel,
                                    dataset: CameraDataset, **configs):
    return ReducedDensificationTrainerWrapper(
        lambda model, dataset, **cfg: NoopDensifier(model),
        model, dataset, **configs)


def DepthReducedDensificationTrainer(model: GaussianModel,
                                     dataset: TrainableCameraDataset, **configs):
    return DepthTrainerWrapper(BaseReducedDensificationTrainer, model, dataset,
                               **configs)


ReducedDensificationTrainer = DepthReducedDensificationTrainer
# README.md:86 names this composition BasePrunerInDensifyTrainer
BasePrunerInDensifyTrainer = BaseReducedDensificationTrainer
