"""Weight conversion: torch DINO/DINOv2 checkpoints -> vitvs_tpu params.

The reference downloads pretrained weights from torch.hub at controller
startup (`dinov2_extractor.py:57-83`).  Here, conversion is an offline step:
a torch ``state_dict`` (or a ``.pth`` file) is remapped into the stacked-block
pytree layout of :mod:`vitvs_tpu.models.vit` and persisted with orbax.

Name mapping (DINOv2 hub naming; DINO v1 is identical minus LayerScale):

    cls_token (1,1,D)                 -> cls_token (D,)
    pos_embed (1,1+N,D)               -> pos_embed (1+N,D)
    patch_embed.proj.weight (D,3,P,P) -> patch_embed.kernel (P,P,3,D)  [HWIO]
    blocks.{i}.attn.qkv.weight (3D,D) -> blocks.qkv_kernel[i] (D,3,h,hd)
    blocks.{i}.ls{1,2}.gamma          -> blocks.ls{1,2}[i]   (ones if absent)
    blocks.{i}.mlp.fc{1,2}.weight     -> blocks.fc{1,2}_kernel[i] (transposed)
    norm.weight/bias                  -> norm_scale/norm_bias

``mask_token`` / ``register_tokens`` / classifier heads are dropped (unused by
the descriptor path, mirroring the reference which never touches them).
"""

from __future__ import annotations

import os
from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from vitvs_tpu.models.vit import PRESETS, ViTConfig, ViTParams, make_config


def _np(t: Any) -> np.ndarray:
    """torch.Tensor | ndarray -> float32 ndarray without importing torch."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def infer_config(state_dict: Mapping[str, Any], model_name: str | None = None,
                 stride: int | None = None) -> ViTConfig:
    """Infer the architecture from a state_dict's shapes."""
    pw = _np(state_dict["patch_embed.proj.weight"])
    d, _, p, _ = pw.shape
    depth = 1 + max(int(k.split(".")[1]) for k in state_dict if k.startswith("blocks."))
    n = _np(state_dict["pos_embed"]).shape[1] - 1
    pos_grid = int(round(np.sqrt(n)))
    use_ls = "blocks.0.ls1.gamma" in state_dict or "blocks.0.gamma_1" in state_dict
    swiglu = "blocks.0.mlp.w12.weight" in state_dict
    ffn_hidden = None
    if swiglu:
        ffn_hidden = _np(state_dict["blocks.0.mlp.w3.weight"]).shape[1]
    if model_name is not None and model_name in PRESETS:
        cfg = make_config(model_name, stride)
        assert cfg.embed_dim == d and cfg.depth == depth, (
            f"checkpoint shapes ({d=}, {depth=}) do not match preset {model_name}")
        return cfg
    heads = {384: 6, 768: 12, 1024: 16, 1536: 24}.get(d, max(1, d // 64))
    return ViTConfig(patch_size=p, embed_dim=d, depth=depth, num_heads=heads,
                     pos_grid=pos_grid, use_layerscale=use_ls,
                     stride=stride if stride is not None else p,
                     ffn="swiglu" if swiglu else "mlp", ffn_hidden=ffn_hidden,
                     model_name=model_name or f"custom_vit_d{d}_p{p}")


def from_torch_state_dict(
    state_dict: Mapping[str, Any],
    model_name: str | None = None,
    stride: int | None = None,
) -> tuple[ViTParams, ViTConfig]:
    cfg = infer_config(state_dict, model_name, stride)
    sd = {k: _np(v) for k, v in state_dict.items()}
    D, L = cfg.embed_dim, cfg.depth

    def stack(fmt: str, transform=lambda a: a, default=None):
        outs = []
        for i in range(L):
            key = fmt.format(i=i)
            if key in sd:
                outs.append(transform(sd[key]))
            elif default is not None:
                outs.append(default)
            else:
                raise KeyError(key)
        return jnp.asarray(np.stack(outs))

    ones_d = np.ones((D,), np.float32)
    params: ViTParams = {
        "patch_embed": {
            "kernel": jnp.asarray(sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(sd["patch_embed.proj.bias"]),
        },
        "cls_token": jnp.asarray(sd["cls_token"].reshape(-1)),
        "pos_embed": jnp.asarray(sd["pos_embed"].reshape(-1, D)),
        "blocks": {
            "norm1_scale": stack("blocks.{i}.norm1.weight"),
            "norm1_bias": stack("blocks.{i}.norm1.bias"),
            # head-major layout (D, 3, h, hd) — a bitcast of the torch (D, 3D)
            # transpose; makes the tp head sharding a real axis (vit.init_vit)
            "qkv_kernel": stack(
                "blocks.{i}.attn.qkv.weight",
                lambda a: a.T.reshape(D, 3, cfg.num_heads, cfg.head_dim)),
            "qkv_bias": stack(
                "blocks.{i}.attn.qkv.bias",
                lambda a: a.reshape(3, cfg.num_heads, cfg.head_dim)),
            "proj_kernel": stack("blocks.{i}.attn.proj.weight", lambda a: a.T),
            "proj_bias": stack("blocks.{i}.attn.proj.bias"),
            "ls1": stack("blocks.{i}.ls1.gamma", default=ones_d),
            "norm2_scale": stack("blocks.{i}.norm2.weight"),
            "norm2_bias": stack("blocks.{i}.norm2.bias"),
            # GELU MLP uses fc1/fc2; DINOv2-giant SwiGLU uses fused w12 + w3
            "fc1_kernel": stack(
                "blocks.{i}.mlp.w12.weight" if cfg.ffn == "swiglu"
                else "blocks.{i}.mlp.fc1.weight", lambda a: a.T),
            "fc1_bias": stack(
                "blocks.{i}.mlp.w12.bias" if cfg.ffn == "swiglu"
                else "blocks.{i}.mlp.fc1.bias"),
            "fc2_kernel": stack(
                "blocks.{i}.mlp.w3.weight" if cfg.ffn == "swiglu"
                else "blocks.{i}.mlp.fc2.weight", lambda a: a.T),
            "fc2_bias": stack(
                "blocks.{i}.mlp.w3.bias" if cfg.ffn == "swiglu"
                else "blocks.{i}.mlp.fc2.bias"),
            "ls2": stack("blocks.{i}.ls2.gamma", default=ones_d),
        },
        "norm_scale": jnp.asarray(sd["norm.weight"]),
        "norm_bias": jnp.asarray(sd["norm.bias"]),
    }
    return params, cfg


def from_torch_file(path: str | os.PathLike, model_name: str | None = None,
                    stride: int | None = None) -> tuple[ViTParams, ViTConfig]:
    import torch  # local import: torch is an offline conversion dependency only

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    return from_torch_state_dict(sd, model_name, stride)


# ---------------------------------------------------------------------------
# Orbax persistence (the reference persists nothing; torch-hub cache only)
# ---------------------------------------------------------------------------


def save_params(params: ViTParams, path: str | os.PathLike) -> None:
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), params)


def load_params(path: str | os.PathLike) -> ViTParams:
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path))
