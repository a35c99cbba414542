from vitvs_tpu.match.correspondence import (
    MatchResult,
    cosine_similarity_matrix,
    find_correspondences,
    match_points_to_pixels,
    refine_matches_subpixel,
)

__all__ = [
    "MatchResult",
    "cosine_similarity_matrix",
    "find_correspondences",
    "match_points_to_pixels",
    "refine_matches_subpixel",
]
