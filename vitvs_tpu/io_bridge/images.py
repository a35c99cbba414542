"""Image file I/O (goal images, poster textures).

The reference loads the goal image with PIL and converts to RGB
(`load_goal_image`, vitvs_v2.py:444-453); same here, returning float32
[0, 1] numpy arrays for the device pipeline.
"""

from __future__ import annotations

import numpy as np


def load_image(path: str) -> np.ndarray:
    """RGB float32 [0,1] (H, W, 3)."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    return np.asarray(img, np.float32) / 255.0


def load_goal_image(path: str) -> np.ndarray:
    """Alias mirroring the reference API name."""
    return load_image(path)


def save_image(path: str, rgb: np.ndarray) -> None:
    from PIL import Image

    arr = np.asarray(rgb)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)
