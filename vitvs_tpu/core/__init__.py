from vitvs_tpu.core.camera import CameraIntrinsics
from vitvs_tpu.core import se3, image

__all__ = ["CameraIntrinsics", "se3", "image"]
