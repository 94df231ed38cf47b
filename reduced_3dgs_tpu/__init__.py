"""reduced_3dgs_tpu — TPU-native (JAX/XLA/Pallas) 3D Gaussian Splatting with
memory-footprint reduction: redundancy + rendered-importance pruning,
per-Gaussian adaptive SH degree culling, and codebook vector quantization.

A ground-up re-design, for TPU, of the capabilities of
yindaheng98/reduced-3dgs (reference mounted at /root/reference).
"""

__version__ = "0.1.0"

from .combinations import (BaseFullPruningTrainer,  # noqa: F401
                           BaseFullReducedDensificationTrainer,
                           CameraFullPruningTrainer,
                           CameraFullReducedDensificationTrainer,
                           CameraOpacityResetFullReducedDensificationTrainer,
                           CameraSHCullingFullPruningTrainer,
                           CameraSHCullingFullReducedDensificationTrainer,
                           CameraSHCullingOpacityResetDensificationTrainer,
                           CameraSHCullingOpacityResetFullReducedDensificationTrainer,
                           CameraSHCullingTrainer, DepthFullPruningTrainer,
                           DepthFullReducedDensificationTrainer,
                           FullPruningDensifierWrapper, FullPruningTrainer,
                           FullPruningTrainerWrapper,
                           FullReducedDensificationDensifierWrapper,
                           FullReducedDensificationTrainer,
                           FullReducedDensificationTrainerWrapper,
                           OpacityResetFullReducedDensificationTrainer,
                           SHCullingFullPruningTrainer,
                           SHCullingFullReducedDensificationTrainer,
                           SHCullingOpacityResetDensificationTrainer,
                           SHCullingOpacityResetFullReducedDensificationTrainer)
from .dataset import (Camera, CameraDataset, TrainableCameraDataset,  # noqa: F401
                      build_camera, colmap_init, prepare_dataset)
from .models import CameraTrainableGaussianModel, GaussianModel  # noqa: F401
