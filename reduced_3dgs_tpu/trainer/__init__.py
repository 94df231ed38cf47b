from functools import partial

from .abc import AbstractTrainer, TrainerWrapper  # noqa: F401
from .base import BaseTrainer, Trainer  # noqa: F401
from .camera_trainer import CameraTrainer, CameraTrainerWrapper  # noqa: F401
from .densifier import (AbstractDensifier, DensificationDensifierWrapper,  # noqa: F401
                        DensificationInstruction, DensificationTrainer,
                        DensifierWrapper, NoopDensifier, OpacityPruner,
                        OpacityPrunerDensifierWrapper,
                        SplitCloneDensifierWrapper)
from .extensions import (DepthTrainerWrapper, OpacityResetTrainerWrapper,  # noqa: F401
                         ScaleRegularizeTrainerWrapper)


def _noop_ctor(model, dataset, **configs):
    del dataset, configs
    return NoopDensifier(model)


def BaseDensificationTrainer(model, dataset, **configs):
    """Plain vanilla-3DGS densification trainer (densify + prune)."""
    return DensificationTrainer.from_densifier_constructor(
        partial(DensificationDensifierWrapper, _noop_ctor),
        model, dataset, **configs)


def DepthDensificationTrainer(model, dataset, **configs):
    return DepthTrainerWrapper(BaseDensificationTrainer, model, dataset,
                               **configs)


def OpacityResetDensificationTrainer(model, dataset, **configs):
    """Depth + densification + periodic opacity reset (the reference base
    package trainer used by the densify-* modes, combinations.py:119-127)."""
    return OpacityResetTrainerWrapper(DepthDensificationTrainer, model,
                                      dataset, **configs)
