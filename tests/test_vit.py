"""Golden tests: JAX ViT vs torch oracle (trans-framework parity)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from vitvs_tpu.models import convert, extractor, vit
from tests.torch_ref import TorchViT, torch_log_bin_oracle

RNG = np.random.default_rng(7)


def _make_pair(patch=14, dim=96, depth=4, heads=3, pos_grid=37, layerscale=True,
               stride=None, model_name="dinov2_vits14"):
    tm = TorchViT(patch=patch, dim=dim, depth=depth, heads=heads,
                  pos_grid=pos_grid, layerscale=layerscale, stride=stride)
    tm.eval()
    # randomize all weights so parity is non-trivial
    gen = torch.Generator().manual_seed(3)
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.02)
    params, cfg = convert.from_torch_state_dict(tm.state_dict(), stride=stride)
    # infer_config guesses head count from dim; override for the tiny oracle
    cfg = vit.ViTConfig(patch_size=patch, embed_dim=dim, depth=depth,
                        num_heads=heads, pos_grid=pos_grid,
                        use_layerscale=layerscale,
                        stride=stride or patch, model_name=model_name)
    return tm, params, cfg


def _img(size, batch=1):
    return RNG.standard_normal((batch, size, size, 3)).astype(np.float32)


class TestForwardParity:
    def test_full_forward_native_grid(self):
        tm, params, cfg = _make_pair(pos_grid=8, patch=14)
        img = _img(8 * 14)
        with torch.no_grad():
            ref = tm.forward_features(torch.from_numpy(img).permute(0, 3, 1, 2)).numpy()
        ours = np.asarray(vit.vit_forward(params, cfg, jnp.asarray(img), precision="highest"))
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)

    def test_token_facet_with_pos_interp(self):
        # 308 input with pos_grid 37 => 22x22 interpolation, the exact
        # reference configuration (config.yaml:14, dinov2_extractor.py:107-115)
        tm, params, cfg = _make_pair(pos_grid=37)
        img = _img(308)
        layer = 2
        with torch.no_grad():
            ref = tm.forward_features(torch.from_numpy(img).permute(0, 3, 1, 2), upto=layer).numpy()
        ours = np.asarray(vit.vit_features(params, cfg, jnp.asarray(img), layer=layer,
                                           facet="token", precision="highest"))
        assert ours.shape == ref.shape == (1, 1 + 22 * 22, 96)
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)

    @pytest.mark.parametrize("facet", ["key", "query", "value"])
    def test_qkv_facets(self, facet):
        tm, params, cfg = _make_pair(pos_grid=37)
        img = _img(154)  # 11x11 grid
        layer = 3
        with torch.no_grad():
            ref = tm.facet(torch.from_numpy(img).permute(0, 3, 1, 2), layer, facet).numpy()
        ours = np.asarray(vit.vit_features(params, cfg, jnp.asarray(img), layer=layer,
                                           facet=facet, precision="highest"))
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)

    def test_overlapping_stride(self):
        # stride < patch: conv path + stride-aware pos interp
        tm, params, cfg = _make_pair(patch=14, stride=7, pos_grid=37)
        img = _img(112)  # grid 1+(112-14)//7 = 15
        layer = 1
        with torch.no_grad():
            ref = tm.forward_features(torch.from_numpy(img).permute(0, 3, 1, 2), upto=layer).numpy()
        ours = np.asarray(vit.vit_features(params, cfg, jnp.asarray(img), layer=layer,
                                           facet="token", precision="highest"))
        assert ours.shape == ref.shape == (1, 1 + 15 * 15, 96)
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)

    def test_no_layerscale_dino_v1(self):
        tm, params, cfg = _make_pair(patch=8, pos_grid=28, layerscale=False,
                                     model_name="dino_vits8")
        img = _img(64)
        with torch.no_grad():
            ref = tm.forward_features(torch.from_numpy(img).permute(0, 3, 1, 2), upto=3).numpy()
        ours = np.asarray(vit.vit_features(params, cfg, jnp.asarray(img), layer=3,
                                           facet="token", precision="highest"))
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


class TestLogBin:
    @pytest.mark.parametrize("hierarchy", [1, 2])
    def test_log_bin_matches_oracle(self, hierarchy):
        gh = gw = 7
        D = 12
        feats = RNG.standard_normal((2, gh * gw, D)).astype(np.float32)
        ours = np.asarray(extractor.log_bin(jnp.asarray(feats), (gh, gw), hierarchy))
        ref = torch_log_bin_oracle(torch.from_numpy(feats), gh, gw, hierarchy).numpy()
        assert ours.shape == ref.shape == (2, gh * gw, D * (1 + 8 * hierarchy))
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestDescriptors:
    def test_descriptor_shapes_token_binned(self):
        _, params, cfg = _make_pair(pos_grid=37)
        img = _img(154)
        desc = extractor.extract_descriptors(params, cfg, jnp.asarray(img),
                                             layer=3, facet="token", bin=True,
                                             precision="highest")
        assert desc.shape == (1, 1, 121, 96 * 9)

    def test_descriptor_head_fold_ordering(self):
        tm, params, cfg = _make_pair(pos_grid=37)
        img = _img(154)
        with torch.no_grad():
            ref = tm.facet(torch.from_numpy(img).permute(0, 3, 1, 2), 2, "key")
            # reference fold: (B,h,t,d) -> permute(0,2,3,1) -> flatten(d,h)
            ref = ref[:, :, 1:, :].permute(0, 2, 3, 1).flatten(-2).numpy()
        ours = np.asarray(extractor.extract_descriptors(
            params, cfg, jnp.asarray(img), layer=2, facet="key", bin=False,
            precision="highest"))[:, 0]
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)

    def test_saliency_maps_bounded(self):
        _, params, cfg = _make_pair(pos_grid=37)
        sal = extractor.extract_saliency_maps(params, cfg, jnp.asarray(_img(154)),
                                              precision="highest")
        s = np.asarray(sal)
        assert s.shape == (1, 121)
        assert s.min() == pytest.approx(0.0, abs=1e-6)
        assert s.max() == pytest.approx(1.0, abs=1e-6)


class TestConvertRoundtrip:
    def test_orbax_roundtrip(self, tmp_path):
        _, params, cfg = _make_pair(pos_grid=8)
        path = tmp_path / "ckpt"
        convert.save_params(params, path)
        restored = convert.load_params(path)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_infer_config_from_shapes(self):
        tm = TorchViT(patch=14, dim=384, depth=2, heads=6, pos_grid=37)
        params, cfg = convert.from_torch_state_dict(tm.state_dict())
        assert cfg.embed_dim == 384 and cfg.depth == 2 and cfg.num_heads == 6
        assert cfg.use_layerscale
        # head-major storage: bitcast of the flat (2, 384, 1152) [q|k|v]
        assert params["blocks"]["qkv_kernel"].shape == (2, 384, 3, 6, 64)


class TestSwiGLU:
    def test_swiglu_forward_parity(self):
        """DINOv2-giant-style SwiGLU FFN vs torch oracle."""
        tm = TorchViT(patch=14, dim=96, depth=2, heads=3, pos_grid=16,
                      layerscale=True, swiglu=True)
        tm.eval()
        gen = torch.Generator().manual_seed(5)
        with torch.no_grad():
            for p in tm.parameters():
                p.copy_(torch.randn(p.shape, generator=gen) * 0.02)
        params, cfg = convert.from_torch_state_dict(tm.state_dict())
        assert cfg.ffn == "swiglu"
        cfg = vit.ViTConfig(patch_size=14, embed_dim=96, depth=2, num_heads=3,
                            pos_grid=16, stride=14, ffn="swiglu",
                            ffn_hidden=cfg.ffn_hidden)
        img = RNG.standard_normal((1, 112, 112, 3)).astype(np.float32)
        with torch.no_grad():
            ref = tm.forward_features(torch.from_numpy(img).permute(0, 3, 1, 2),
                                      upto=1).numpy()
        ours = np.asarray(vit.vit_features(params, cfg, jnp.asarray(img), layer=1,
                                           facet="token", precision="highest"))
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)

    def test_giant_preset(self):
        cfg = vit.make_config("dinov2_vitg14")
        assert cfg.ffn == "swiglu" and cfg.embed_dim == 1536 and cfg.depth == 40
        assert cfg.hidden_dim == 4096
