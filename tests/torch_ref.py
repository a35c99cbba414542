"""Torch oracle for golden tests.

A from-scratch minimal DINOv2-style ViT in torch whose state_dict uses the
torch-hub naming convention, used to validate the JAX implementation
trans-framework.  The behaviors it encodes (SDPA pre-norm blocks with
LayerScale, hook-equivalent facet extraction, '+0.1' bicubic pos-embed
interpolation, loop-free log-binning oracle written directly from the
published DINO descriptor definition) mirror the publicly documented
DINO/DINOv2 architecture.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4.0, layerscale=True, swiglu=False):
        super().__init__()
        self.num_heads = heads
        self.swiglu = swiglu
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.attn.proj = nn.Linear(dim, dim, bias=True)
        self.ls1 = nn.Module()
        self.ls1.gamma = nn.Parameter(torch.ones(dim) * (1e-5 if layerscale else 1.0))
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        if swiglu:
            # DINOv2 SwiGLUFFNFused width
            hidden = (int(dim * mlp_ratio * 2 / 3) + 7) // 8 * 8
            self.mlp.w12 = nn.Linear(dim, 2 * hidden, bias=True)
            self.mlp.w3 = nn.Linear(hidden, dim, bias=True)
        else:
            hidden = int(dim * mlp_ratio)
            self.mlp.fc1 = nn.Linear(dim, hidden, bias=True)
            self.mlp.fc2 = nn.Linear(hidden, dim, bias=True)
        self.ls2 = nn.Module()
        self.ls2.gamma = nn.Parameter(torch.ones(dim) * (1e-5 if layerscale else 1.0))

    def attn_forward(self, x):
        B, N, C = x.shape
        h = self.num_heads
        qkv = self.attn.qkv(x).reshape(B, N, 3, h, C // h)
        q, k, v = torch.unbind(qkv, 2)
        q, k, v = (t.transpose(1, 2) for t in (q, k, v))
        out = F.scaled_dot_product_attention(q, k, v)
        out = out.transpose(1, 2).reshape(B, N, C)
        return self.attn.proj(out)

    def mlp_forward(self, x):
        if self.swiglu:
            x12 = self.mlp.w12(x)
            x1, x2 = x12.chunk(2, dim=-1)
            return self.mlp.w3(F.silu(x1) * x2)
        return self.mlp.fc2(F.gelu(self.mlp.fc1(x)))

    def forward(self, x):
        x = x + self.ls1.gamma * self.attn_forward(self.norm1(x))
        x = x + self.ls2.gamma * self.mlp_forward(self.norm2(x))
        return x


class TorchViT(nn.Module):
    def __init__(self, patch=14, dim=96, depth=4, heads=3, pos_grid=37,
                 layerscale=True, stride=None, swiglu=False):
        super().__init__()
        self.patch_size = patch
        self.stride = stride or patch
        self.embed_dim = dim
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, kernel_size=patch,
                                          stride=self.stride)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, 1 + pos_grid * pos_grid, dim))
        self.blocks = nn.ModuleList(
            [TorchBlock(dim, heads, layerscale=layerscale, swiglu=swiglu)
             for _ in range(depth)]
        )
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        nn.init.trunc_normal_(self.pos_embed, std=0.02)
        nn.init.trunc_normal_(self.cls_token, std=0.02)

    def interpolate_pos_encoding(self, x, w, h):
        npatch = x.shape[1] - 1
        N = self.pos_embed.shape[1] - 1
        if npatch == N and w == h:
            return self.pos_embed
        class_pos = self.pos_embed[:, 0]
        patch_pos = self.pos_embed[:, 1:]
        dim = x.shape[-1]
        w0 = 1 + (w - self.patch_size) // self.stride
        h0 = 1 + (h - self.patch_size) // self.stride
        assert w0 * h0 == npatch
        w0, h0 = w0 + 0.1, h0 + 0.1
        g = int(math.sqrt(N))
        patch_pos = F.interpolate(
            patch_pos.reshape(1, g, g, dim).permute(0, 3, 1, 2),
            scale_factor=(w0 / math.sqrt(N), h0 / math.sqrt(N)),
            mode="bicubic", align_corners=False, recompute_scale_factor=False,
        )
        patch_pos = patch_pos.permute(0, 2, 3, 1).view(1, -1, dim)
        return torch.cat((class_pos.unsqueeze(0), patch_pos), dim=1)

    def prepare_tokens(self, x):
        B, C, H, W = x.shape
        patches = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        cls = self.cls_token.expand(B, -1, -1)
        x = torch.cat((cls, patches), dim=1)
        return x + self.interpolate_pos_encoding(x, W, H)

    def forward_features(self, x, upto=None):
        """Block outputs; `upto=L` returns the output of block L (pre final
        norm), equivalent to the reference's 'token' facet hook."""
        x = self.prepare_tokens(x)
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if upto is not None and i == upto:
                return x
        return self.norm(x)

    def facet(self, x, layer, which):
        """'key'/'query'/'value' facet (B, h, t, hd), matching the reference
        hook that recomputes qkv from the attn module input
        (dinov2_extractor.py:212-218)."""
        t = self.prepare_tokens(x)
        for i, blk in enumerate(self.blocks):
            if i == layer:
                normed = blk.norm1(t)
                B, N, C = normed.shape
                h = blk.num_heads
                qkv = blk.attn.qkv(normed).reshape(B, N, 3, h, C // h).permute(2, 0, 3, 1, 4)
                return {"query": qkv[0], "key": qkv[1], "value": qkv[2]}[which]
            t = blk(t)
        raise ValueError(layer)


def torch_log_bin_oracle(feats: torch.Tensor, gh: int, gw: int, hierarchy: int = 1):
    """Scalar-loop oracle for log-binning, written directly from the
    published descriptor definition: per level k, 3x3 offsets of stride 3^k
    sampled from a stride-1 AvgPool2d(3^k, count_include_pad=False) with
    edge clamping, centre kept only at k=0."""
    B, t, D = feats.shape
    x = feats.reshape(B, gh, gw, D).permute(0, 3, 1, 2)  # B,D,H,W
    pools = []
    for k in range(hierarchy):
        win = 3 ** k
        if win == 1:
            pools.append(x)
        else:
            pools.append(
                nn.AvgPool2d(win, stride=1, padding=win // 2, count_include_pad=False)(x)
            )
    num_bins = 1 + 8 * hierarchy
    out = torch.zeros(B, D * num_bins, gh, gw)
    for y in range(gh):
        for xx in range(gw):
            part = 0
            for k in range(hierarchy):
                step = 3 ** k
                for i in range(y - step, y + step + 1, step):
                    for j in range(xx - step, xx + step + 1, step):
                        if i == y and j == xx and k != 0:
                            continue
                        ci = min(max(i, 0), gh - 1)
                        cj = min(max(j, 0), gw - 1)
                        out[:, part * D:(part + 1) * D, y, xx] = pools[k][:, :, ci, cj]
                        part += 1
    return out.flatten(-2).permute(0, 2, 1)  # (B, t, D*num_bins)
