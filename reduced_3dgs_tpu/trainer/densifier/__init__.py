from functools import partial

from .abc import (AbstractDensifier, DensificationInstruction,  # noqa: F401
                  DensificationTrainer, DensifierWrapper, NoopDensifier)
from .opacity_pruner import OpacityPruner, OpacityPrunerDensifierWrapper  # noqa: F401
from .split_clone import SplitCloneDensifier, SplitCloneDensifierWrapper  # noqa: F401


def DensificationDensifierWrapper(base_densifier_constructor, model, dataset,
                                  **configs):
    """Vanilla 3DGS densify (clone/split) + opacity/size prune
    (reference base package's DensificationDensifierWrapper)."""
    return OpacityPrunerDensifierWrapper(
        partial(SplitCloneDensifierWrapper, base_densifier_constructor),
        model, dataset, **configs)
