from .gaussian_model import CameraTrainableGaussianModel, GaussianModel  # noqa: F401
from . import ply  # noqa: F401
