from .camera import (Camera, build_camera, stack_cameras,  # noqa: F401
                     stackable, strip_images)
from .dataset import CameraDataset, TrainableCameraDataset, prepare_dataset  # noqa: F401
from . import colmap  # noqa: F401
from .colmap import colmap_init  # noqa: F401
