from vitvs_tpu.classical.features import (
    grayscale,
    harris_response,
    detect_corners,
    sift_like_descriptors,
    match_descriptors,
)

__all__ = [
    "grayscale",
    "harris_response",
    "detect_corners",
    "sift_like_descriptors",
    "match_descriptors",
]
