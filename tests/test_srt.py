"""SRT decoder (reference modules/layers/srt.py + heads/srt_head.py):
positional encoding parity vs the torch formula, shape contracts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msr3d_tpu.nn.srt import SRTDecoder, positional_encoding, ray_encoding
from msr3d_tpu.registry import HEADS_REGISTRY


class TestPositionalEncoding:
    def test_matches_torch_formula(self):
        torch = pytest.importorskip("torch")
        import math

        coords_np = np.random.default_rng(0).normal(size=(2, 5, 3)).astype(np.float32)
        got = positional_encoding(jnp.asarray(coords_np), num_octaves=8, start_octave=0)

        c = torch.as_tensor(coords_np)
        octaves = torch.arange(0, 8).float()
        mult = 2**octaves * math.pi
        scaled = c.unsqueeze(-1) * mult
        want = torch.cat(
            [torch.sin(scaled).reshape(2, 5, 24), torch.cos(scaled).reshape(2, 5, 24)], -1
        )
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)

    def test_ray_encoding_width(self):
        pos = jnp.zeros((2, 7, 3))
        rays = jnp.zeros((2, 7, 3))
        enc = ray_encoding(pos, rays)
        assert enc.shape == (2, 7, 180)  # 3*15*2 + 3*15*2


class TestSRTDecoder:
    def test_registered_and_shapes(self):
        assert HEADS_REGISTRY.get("SRTDecoder") is SRTDecoder
        m = SRTDecoder(hidden_dim=64)
        rng = np.random.default_rng(0)
        feats = jnp.asarray(rng.normal(size=(2, 10, 64)), jnp.float32)
        pts = jnp.asarray(rng.normal(size=(2, 6, 3)), jnp.float32)
        rays = jnp.asarray(rng.normal(size=(2, 6, 3)), jnp.float32)
        v = m.init(jax.random.key(0), feats, pts, rays)
        out = m.apply(v, feats, pts, rays)
        assert out.shape == (2, 6, 3)
        arr = np.asarray(out)
        assert (arr >= 0).all() and (arr <= 1).all()  # sigmoid pixels


class TestSRTEncoder:
    def test_registered_and_shapes(self):
        from msr3d_tpu.nn.srt import SRTEncoder, ray_image_encoding
        from msr3d_tpu.registry import VISION_REGISTRY

        assert VISION_REGISTRY.get("SRTEncoder") is SRTEncoder
        rng = np.random.default_rng(0)
        B, Nv, H, W = 2, 3, 32, 32
        images = jnp.asarray(rng.uniform(size=(B, Nv, H, W, 3)), jnp.float32)
        cam = jnp.asarray(rng.normal(size=(B, Nv, 3)), jnp.float32)
        rays = jnp.asarray(rng.normal(size=(B, Nv, H, W, 3)), jnp.float32)

        # 183-channel ray image (mv_srt_encoder.py:39: 3 + 2*3*15*2)
        enc = ray_image_encoding(cam.reshape(-1, 3), rays.reshape(-1, H, W, 3))
        assert enc.shape == (B * Nv, H, W, 180)

        m = SRTEncoder(num_conv_blocks=3, num_att_blocks=1, hidden_dim=48,
                       num_heads=4, mlp_dim=96)
        v = m.init(jax.random.key(0), images, cam, rays)
        out = m.apply(v, images, cam, rays)
        # 4 stride-2 convs: 32 -> 2, so 4 patches/view
        assert out.shape == (B, Nv * 4, 48)
        assert np.isfinite(np.asarray(out)).all()

    def test_pos_encoding_broadcast_constant_over_pixels(self):
        """The camera-position half of the ray image is constant per view."""
        from msr3d_tpu.nn.srt import ray_image_encoding

        rng = np.random.default_rng(1)
        cam = jnp.asarray(rng.normal(size=(2, 3)), jnp.float32)
        rays = jnp.asarray(rng.normal(size=(2, 8, 8, 3)), jnp.float32)
        enc = np.asarray(ray_image_encoding(cam, rays))
        pos_part = enc[..., :90]
        assert np.allclose(pos_part, pos_part[:, :1, :1, :])
        ray_part = enc[..., 90:]
        assert not np.allclose(ray_part[:, 0, 0], ray_part[:, 1, 1])
