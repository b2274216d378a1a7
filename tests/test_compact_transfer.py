"""compact_transfer: int16/int8 obj_fts transfer must round-trip within
quantization resolution and leave greedy generation unchanged on the
tiny model."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_msr3d import tiny_data_dict


def test_pack_unpack_roundtrip(tiny_msr3d, rng):
    model = tiny_msr3d
    model.compact_transfer = True
    fts = (rng.uniform(-1, 1, size=(2, 3, 8, 6))).astype(np.float32)
    batch = model._maybe_pack({"obj_fts": fts.copy()})
    assert "obj_fts" not in batch
    assert batch["obj_fts_xyz_q"].dtype == np.int16
    assert batch["obj_fts_rgb_q"].dtype == np.int8
    out = model._unpack_batch({k: jnp.asarray(v) for k, v in batch.items()})
    rec = np.asarray(out["obj_fts"])
    assert np.abs(rec[..., :3] - fts[..., :3]).max() <= 0.5 / 32767 + 1e-7
    assert np.abs(rec[..., 3:] - fts[..., 3:]).max() <= 0.5 / 127 + 1e-7


@pytest.mark.slow  # two tiny-model generate compiles (~45 s); the cheap
# roundtrip test above stays in the fast gate
def test_generate_tokens_unchanged(tiny_msr3d, rng):
    model = tiny_msr3d
    data = tiny_data_dict(rng)
    # keep inputs exactly representable so the comparison is strict
    fts = data["obj_fts"].clip(-1, 1)
    fts[..., :3] = np.round(fts[..., :3] * 32767) / 32767
    fts[..., 3:] = np.round(fts[..., 3:] * 127) / 127
    data["obj_fts"] = fts.astype(np.float32)

    base = model.generate(dict(data), use_beam=False, max_new_tokens=6)
    model.compact_transfer = True
    packed = model.generate(dict(data), use_beam=False, max_new_tokens=6)
    np.testing.assert_array_equal(base["output_tokens"], packed["output_tokens"])
