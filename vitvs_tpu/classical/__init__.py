from vitvs_tpu.classical.features import (
    grayscale,
    harris_response,
    detect_corners,
    sift_like_descriptors,
    match_descriptors,
)
from vitvs_tpu.classical.scalespace import sift_features
from vitvs_tpu.classical.binary import akaze_features, orb_features

__all__ = [
    "grayscale",
    "harris_response",
    "detect_corners",
    "sift_like_descriptors",
    "match_descriptors",
    "sift_features",
    "orb_features",
    "akaze_features",
]
