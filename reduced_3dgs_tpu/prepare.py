"""Factories and the training-mode registry.

Mirrors /root/reference/reduced_3dgs/prepare.py: backend dispatch
(prepare.py:15-30), `prepare_gaussians` (:33-36), the `modes` registry of 10
trainer constructors (:39-50), `prepare_quantizer` (:53-92), and
`prepare_trainer` (:95-114).

Backends: the single TPU renderer subsumes the reference's "inria" and
"gsplat" CUDA backends (both are 3DGS rasterizers; ours is the tiled
JAX/XLA pipeline). "gsplat-2dgs" (surfel splatting with depth-normal
regularization, ops/rasterize/twodgs.py) maps to the 2DGS model classes.
"""
from __future__ import annotations

from typing import Callable

from .combinations import (CameraFullPruningTrainer,
                           CameraOpacityResetFullReducedDensificationTrainer,
                           CameraSHCullingFullPruningTrainer,
                           CameraSHCullingOpacityResetDensificationTrainer,
                           CameraSHCullingOpacityResetFullReducedDensificationTrainer,
                           FullPruningTrainer,
                           OpacityResetFullReducedDensificationTrainer,
                           SHCullingFullPruningTrainer,
                           SHCullingOpacityResetDensificationTrainer,
                           SHCullingOpacityResetFullReducedDensificationTrainer)
from .dataset.colmap import colmap_init
from .models.gaussian_model import GaussianModel
from .quantization import VectorQuantizeTrainerWrapper
from .trainer import AbstractTrainer
from .trainer.extensions import ScaleRegularizeTrainerWrapper

backends = ["tpu", "inria", "gsplat", "gsplat-2dgs"]


def get_gaussian_model_class(backend: str, trainable_camera: bool = False
                             ) -> Callable[[int], GaussianModel]:
    from .shculling import (CameraTrainableVariableSHGaussianModel,
                            CameraTrainableVariableSHGsplat2DGSGaussianModel,
                            VariableSHGaussianModel,
                            VariableSHGsplat2DGSGaussianModel)
    if backend in ("tpu", "inria", "gsplat"):
        return (CameraTrainableVariableSHGaussianModel if trainable_camera
                else VariableSHGaussianModel)
    if backend == "gsplat-2dgs":
        return (CameraTrainableVariableSHGsplat2DGSGaussianModel
                if trainable_camera else VariableSHGsplat2DGSGaussianModel)
    raise ValueError(f"Unknown backend: {backend}")


def prepare_gaussians(sh_degree: int, source: str, device: str = "tpu",
                      trainable_camera: bool = False, load_ply: str = None,
                      backend: str = "tpu") -> GaussianModel:
    gaussians = get_gaussian_model_class(
        backend, trainable_camera=trainable_camera)(sh_degree).to(device)
    if load_ply:
        gaussians.load_ply(load_ply)
    else:
        colmap_init(gaussians, source)
    return gaussians


modes = {
    "densify-shculling": SHCullingOpacityResetDensificationTrainer,
    "pruning": FullPruningTrainer,
    "pruning-shculling": SHCullingFullPruningTrainer,
    "densify-pruning": OpacityResetFullReducedDensificationTrainer,
    "densify-pruning-shculling": SHCullingOpacityResetFullReducedDensificationTrainer,
    "camera-densify-shculling": CameraSHCullingOpacityResetDensificationTrainer,
    "camera-pruning": CameraFullPruningTrainer,
    "camera-pruning-shculling": CameraSHCullingFullPruningTrainer,
    "camera-densify-pruning": CameraOpacityResetFullReducedDensificationTrainer,
    "camera-densify-pruning-shculling": CameraSHCullingOpacityResetFullReducedDensificationTrainer,
}


def prepare_quantizer(
        gaussians: GaussianModel,
        dataset,
        base_constructor,
        load_quantized: str = None,
        num_clusters: int = 256,
        num_clusters_rotation_re=None,
        num_clusters_rotation_im=None,
        num_clusters_opacity=None,
        num_clusters_scaling=None,
        num_clusters_features_dc=None,
        num_clusters_features_rest=(),
        quantize_from_iter: int = 5000,
        quantize_until_iter: int = 30000,
        quantize_interval: int = 1000,
        **configs):
    trainer = VectorQuantizeTrainerWrapper(
        base_constructor(gaussians, dataset=dataset, **configs),
        num_clusters=num_clusters,
        num_clusters_rotation_re=num_clusters_rotation_re,
        num_clusters_rotation_im=num_clusters_rotation_im,
        num_clusters_opacity=num_clusters_opacity,
        num_clusters_scaling=num_clusters_scaling,
        num_clusters_features_dc=num_clusters_features_dc,
        num_clusters_features_rest=num_clusters_features_rest,
        quantize_from_iter=quantize_from_iter,
        quantize_until_iter=quantize_until_iter,
        quantize_interval=quantize_interval,
    )
    if load_quantized:
        trainer.quantizer.load_quantized(trainer.model, load_quantized)
    return trainer, trainer.quantizer


def prepare_trainer(gaussians: GaussianModel, dataset, mode: str,
                    with_scale_reg: bool = False, quantize: bool = False,
                    load_quantized: str = None, configs=None) -> AbstractTrainer:
    configs = dict(configs or {})
    constructor = modes[mode]
    if with_scale_reg:
        base_mode = modes[mode]
        constructor = (lambda model, dataset, **cfg:
                       ScaleRegularizeTrainerWrapper(base_mode, model,
                                                     dataset, **cfg))
    if quantize:
        trainer, quantizer = prepare_quantizer(
            gaussians, dataset=dataset, base_constructor=constructor,
            load_quantized=load_quantized, **configs)
    else:
        trainer = constructor(gaussians, dataset=dataset, **configs)
        quantizer = None
    return trainer, quantizer
