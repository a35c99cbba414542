"""Non-learned descriptor baselines.

`pixel{P}` models plug into the ViT pipeline interface but compute
descriptors that are exactly the raw (normalized) image patches: identity
patch embedding, a single pass-through block (LayerScale ~ 0), zero
positional embedding.  Dense cosine matching then degenerates to patch
template matching — a useful no-learning baseline, and a convergent default
for simulation demos when converted DINOv2 weights are unavailable
(zero-egress environments cannot reach torch.hub).
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp

from vitvs_tpu.models.vit import ViTConfig, ViTParams, init_vit


def is_pixel_model(name: str) -> bool:
    return bool(re.fullmatch(r"pixel(\d+)", name))


def pixel_config(name: str) -> ViTConfig:
    m = re.fullmatch(r"pixel(\d+)", name)
    if not m:
        raise ValueError(f"not a pixel model: {name!r}")
    p = int(m.group(1))
    return ViTConfig(patch_size=p, embed_dim=p * p * 3, depth=1, num_heads=1,
                     pos_grid=16, use_layerscale=False, stride=p,
                     model_name=name)


def init_pixel_params(cfg: ViTConfig) -> ViTParams:
    """Identity patch embed + pass-through block + zero pos embed."""
    params = init_vit(cfg, jax.random.PRNGKey(0))
    d = cfg.embed_dim
    params["patch_embed"]["kernel"] = jnp.eye(d, dtype=jnp.float32).reshape(
        cfg.patch_size, cfg.patch_size, 3, d)
    params["patch_embed"]["bias"] = jnp.zeros((d,), jnp.float32)
    params["pos_embed"] = jnp.zeros_like(params["pos_embed"])
    params["blocks"]["ls1"] = params["blocks"]["ls1"] * 1e-8
    params["blocks"]["ls2"] = params["blocks"]["ls2"] * 1e-8
    return params
