"""Tests for the TPU-native Swin3D (nn/swin3d.py): host plan invariants,
a NumPy oracle for cRSE window attention, and the full UNet/encoder."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msr3d_tpu.nn.swin3d import (
    PCDSwin3DEncoder,
    Swin3DUNet,
    WindowAttentionCRSE,
    _conv_neighbor_plan,
    _grid_coords_down,
    _knn,
    _pool_groups,
    _stage_window_plans,
    _window_partition,
    build_swin3d_plans,
)


def _scene(rng, n=120, grid=12, batches=2):
    """Unique random voxels + continuous signal coords."""
    seen, rows = set(), []
    while len(rows) < n:
        b = int(rng.integers(0, batches))
        v = tuple(int(x) for x in rng.integers(0, grid, 3))
        if (b, *v) not in seen:
            seen.add((b, *v))
            rows.append((b, *v))
    coords = np.array(rows, np.int64)
    frac = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    colors = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    coords_f = np.concatenate(
        [coords[:, :1].astype(np.float32), coords[:, 1:] + frac, colors], axis=1
    )
    return coords, coords_f


class TestPlans:
    def test_window_partition_covers_once(self, rng):
        coords, _ = _scene(rng)
        windows, mask, w_w_xyz = _window_partition(coords, 1, 4, 0)
        flat = windows[mask]
        assert sorted(flat.tolist()) == list(range(coords.shape[0]))
        assert w_w_xyz.min() >= 0 and w_w_xyz.max() < 4
        # voxels in one window share (batch, window cell)
        for w in range(windows.shape[0]):
            members = windows[w][mask[w]]
            cells = coords[members, 1:] // 4
            assert len(np.unique(coords[members, 0])) == 1
            assert (cells == cells[0]).all()

    def test_shifted_partition_differs(self, rng):
        coords, _ = _scene(rng)
        w0, m0, x0 = _window_partition(coords, 1, 4, 0)
        w1, m1, x1 = _window_partition(coords, 1, 4, 2)
        assert not np.array_equal(x0, x1)
        # shift moves the local cell by +2 mod grouping
        assert ((x1 - (coords[:, 1:] + 2) % 4) == 0).all()

    def test_conv_plan_center_is_self(self, rng):
        coords, _ = _scene(rng, n=60)
        plan = _conv_neighbor_plan(coords, 1)
        assert (plan[:, 13] == np.arange(60)).all()  # offset (0,0,0) is tap 13
        # spot-check one neighbor
        i = 0
        b, x, y, z = coords[i]
        want = -1
        for j, (b2, x2, y2, z2) in enumerate(coords):
            if (b2, x2, y2, z2) == (b, x + 1, y, z):
                want = j
        tap = list(map(tuple, np.array([(1, 0, 0)])))[0]
        from msr3d_tpu.nn.swin3d import _CONV_OFFSETS

        t = int(np.nonzero((_CONV_OFFSETS == np.array(tap)).all(1))[0][0])
        assert plan[i, t] == want

    def test_pool_groups_and_reps(self, rng):
        coords, coords_f = _scene(rng)
        coarse, gidx = _pool_groups(coords, 1, 2)
        # each fine voxel appears once, in the right coarse cell
        flat = gidx[gidx >= 0]
        assert sorted(flat.tolist()) == list(range(coords.shape[0]))
        for g in range(coarse.shape[0]):
            members = gidx[g][gidx[g] >= 0]
            assert ((coords[members, 1:] // 2) * 2 == coarse[g, 1:]).all()
        reps = _grid_coords_down(coords_f, gidx)
        for g in range(coarse.shape[0]):
            members = gidx[g][gidx[g] >= 0]
            center = coords_f[members, 1:4].mean(0)
            d = np.linalg.norm(coords_f[members, 1:4] - center, axis=1)
            assert reps[g] == members[np.argmin(d)]

    def test_knn_bruteforce_and_batch_isolation(self, rng):
        coords, coords_f = _scene(rng)
        q = coords_f[:10, 1:4]
        qb = coords[:10, 0]
        idx = _knn(q, qb, coords_f[:, 1:4], coords[:, 0], 5)
        for i in range(10):
            assert (coords[idx[i], 0] == qb[i]).all()
            sm = np.nonzero(coords[:, 0] == qb[i])[0]
            d = np.linalg.norm(coords_f[sm, 1:4] - q[i], axis=1)
            want = set(sm[np.argsort(d, kind="stable")[:5]].tolist())
            assert set(idx[i].tolist()) == want


def _oracle_window_attention(feats, params, plan, dim, heads, window_size, quant):
    """Independent NumPy implementation of the cRSE attention formula
    (self_attn_aio_fwd.cu:43 + attn_utils.cuh:448-450)."""
    p = params["params"]
    hd = dim // heads
    qkv = feats @ p["qkv"]["kernel"] + p["qkv"]["bias"]
    q, k, v = np.split(qkv.reshape(-1, 3, heads, hd), 3, axis=1)
    q = q[:, 0] * hd**-0.5
    k, v = k[:, 0], v[:, 0]
    nc = plan["n_coords"]
    L = {"xyz": window_size * quant, "rgb": 2 * (2 * quant)}
    out = np.zeros((feats.shape[0], dim), np.float32)
    for w in range(plan["windows"].shape[0]):
        members = plan["windows"][w][plan["mask"][w]]
        nW = len(members)
        logits = np.zeros((nW, nW, heads), np.float32)
        vbias = np.zeros((nW, nW, heads, hd), np.float32)
        for a in range(nW):
            for b in range(nW):
                i, j = members[a], members[b]
                bq = np.zeros((heads, hd), np.float32)
                bk = np.zeros((heads, hd), np.float32)
                bv = np.zeros((heads, hd), np.float32)
                for gname, sl in (("xyz", slice(0, 3)), ("rgb", slice(3, 6))):
                    rel = nc[i, sl] - nc[j, sl]
                    idx = np.clip(np.floor(rel + L[gname]), 0, 2 * L[gname] - 1).astype(int)
                    for ax in range(3):
                        bq += p[f"query_{gname}_table"][ax, idx[ax]]
                        bk += p[f"key_{gname}_table"][ax, idx[ax]]
                        bv += p[f"value_{gname}_table"][ax, idx[ax]]
                logits[a, b] = (
                    (q[i] * k[j]).sum(-1) + (q[i] * bq).sum(-1) + (k[j] * bk).sum(-1)
                )
                vbias[a, b] = bv
        attn = np.exp(logits - logits.max(1, keepdims=True))
        attn /= attn.sum(1, keepdims=True)
        for a in range(nW):
            acc = np.zeros((heads, hd), np.float32)
            for b in range(nW):
                acc += attn[a, b][:, None] * (v[members[b]] + vbias[a, b])
            out[members[a]] = acc.reshape(dim)
    return out @ p["proj"]["kernel"] + p["proj"]["bias"]


class TestWindowAttention:
    DIM, HEADS, WS, QUANT = 16, 2, 4, 2

    @pytest.fixture
    def setup(self, rng):
        coords, coords_f = _scene(rng, n=40, grid=8)
        plans = _stage_window_plans(coords, coords_f, 1, self.WS, self.QUANT)
        feats = rng.normal(size=(40, self.DIM)).astype(np.float32)
        mod = WindowAttentionCRSE(self.DIM, self.WS, self.QUANT, self.HEADS)
        jplan = jax.tree_util.tree_map(jnp.asarray, plans["win"])
        params = mod.init(jax.random.PRNGKey(0), jnp.asarray(feats), jplan)
        return mod, params, feats, plans["win"], jplan

    def test_matches_numpy_oracle(self, setup):
        mod, params, feats, plan, jplan = setup
        got = np.asarray(mod.apply(params, jnp.asarray(feats), jplan))
        nparams = jax.tree_util.tree_map(np.asarray, params)
        want = _oracle_window_attention(
            feats, nparams, plan, self.DIM, self.HEADS, self.WS, self.QUANT
        )
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_crse_tables_change_output(self, setup):
        mod, params, feats, plan, jplan = setup
        base = mod.apply(params, jnp.asarray(feats), jplan)
        import flax

        # note: a j-uniform shift of the QUERY table cancels in softmax
        # (logits move by q_i·const for all j); the value table adds to
        # the attention average directly, so it must change the output
        p2 = flax.core.unfreeze(params)
        p2["params"]["value_xyz_table"] = (
            p2["params"]["value_xyz_table"] + 0.5
        )
        pert = mod.apply(p2, jnp.asarray(feats), jplan)
        assert np.abs(np.asarray(base - pert)).max() > 1e-4

    def test_gradients_reach_tables(self, setup):
        mod, params, feats, plan, jplan = setup
        g = jax.grad(
            lambda p: jnp.sum(mod.apply(p, jnp.asarray(feats), jplan) ** 2)
        )(params)
        for name in ("query_xyz_table", "key_rgb_table", "value_xyz_table"):
            assert float(jnp.abs(g["params"][name]).max()) > 0


class TestUNetAndEncoder:
    # the conv-stem variant (False) covers strictly more modules
    # (SparseResBlock + pre_down + everything else); the transformer-stem
    # variant compiles a 50 s graph and runs only in the full suite
    @pytest.mark.parametrize(
        "stem_transformer",
        [pytest.param(True, marks=pytest.mark.slow), False],
    )
    def test_full_unet_shapes(self, rng, stem_transformer):
        coords, coords_f = _scene(rng, n=150, grid=16)
        plans = build_swin3d_plans(
            coords, coords_f,
            window_sizes=[4, 4, 4, 4], quant_size=2, num_layers=4,
            stem_transformer=stem_transformer,
        )
        unet = Swin3DUNet(
            depths=(1, 1, 1, 1), channels=(16, 24, 32, 40), num_heads=(2, 2, 2, 2),
            window_sizes=(4, 4, 4, 4), quant_size=2, num_layers=4,
            num_classes=13, stem_transformer=stem_transformer,
        )
        jplans = jax.tree_util.tree_map(jnp.asarray, plans)
        feats = jnp.asarray(rng.normal(size=(150, 6)).astype(np.float32))
        variables = unet.init(jax.random.PRNGKey(0), feats, jplans)
        out, logits = unet.apply(variables, feats, jplans)
        n_out = 150 if stem_transformer else 150  # final res = stem res
        assert out.shape == (n_out, 16) and logits.shape == (n_out, 13)
        assert np.isfinite(np.asarray(out)).all()

    def test_registry_adapter_builds(self):
        """Fast: the registry name resolves and the adapter constructs the
        encoder (no device compile)."""
        import msr3d_tpu.nn.build  # noqa: F401
        from msr3d_tpu.registry import VISION_REGISTRY
        from msr3d_tpu.config import config_from_dict

        cfg = config_from_dict(
            dict(name="PCDSwin3DEncoder",
                 args=dict(depths=[1, 1], channels=[12, 16], num_heads=[2, 2],
                           window_sizes=[3, 3], num_layers=2, quant_size=2,
                           stem_transformer=True))
        )
        enc = VISION_REGISTRY.get("PCDSwin3DEncoder")(cfg)
        assert isinstance(enc, PCDSwin3DEncoder)

    @pytest.mark.slow  # full encoder compile (~20 s)
    def test_encoder_wrapper_and_registry(self, rng):
        import msr3d_tpu.nn.build  # noqa: F401 (populates the registry)
        from msr3d_tpu.registry import VISION_REGISTRY
        from msr3d_tpu.config import config_from_dict

        cfg = config_from_dict(
            dict(
                name="PCDSwin3DEncoder",
                args=dict(
                    depths=[1, 1], channels=[12, 16], num_heads=[2, 2],
                    window_sizes=[3, 3], up_k=2, quant_size=2, num_layers=2,
                    num_classes=5, stem_transformer=True,
                ),
            )
        )
        enc = VISION_REGISTRY.get("PCDSwin3DEncoder")(cfg)
        assert isinstance(enc, PCDSwin3DEncoder)

        n = 80
        xyz = np.concatenate(
            [
                rng.uniform(0, 10, (n, 3)).astype(np.float32),
                np.repeat([[0.0], [1.0]], n // 2, axis=0).astype(np.float32),
            ],
            axis=1,
        )
        colors = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        params = enc.init(jax.random.PRNGKey(0), colors, xyz)
        out, logits, keep = enc(params, colors, xyz)
        assert out.shape[1] == 12 and logits.shape[1] == 5
        assert out.shape[0] == len(keep) <= n
        assert np.isfinite(np.asarray(out)).all()
