"""forward() width-bucketing regression (VERDICT round-1 weak #6):
prompts/answers of different widths inside one 32-bucket must reuse the
same compiled loss function, and padding must not change the loss."""

import numpy as np

from tests.test_msr3d import tiny_data_dict


def test_forward_buckets_widths(tiny_msr3d, rng):
    model = tiny_msr3d
    model._loss_fn = None  # fresh jit cache for the cache-size assertion
    data = tiny_data_dict(rng)

    # choose suffixes that stay inside one 32-wide bucket (byte tokenizer:
    # 1 ASCII char ≈ 1 token); if the base width sits on a bucket edge,
    # shift it off the edge first
    def width(prompts):
        return model._encode_prompts(prompts)[0].shape[1]

    base_prompts = list(data["msr3d_prompt"])
    w = width(base_prompts)
    if w % 32 == 0:
        base_prompts = [p + "x" for p in base_prompts]
        w = width(base_prompts)
    room = -(-w // 32) * 32 - w
    assert room >= 1

    d1 = dict(data, msr3d_prompt=base_prompts)
    loss1 = float(np.asarray(model.forward(d1)["loss"]).mean())

    d2 = dict(data, msr3d_prompt=[p + "y" * min(room, 3) for p in base_prompts])
    model.forward(d2)
    assert model._loss_fn._cache_size() == 1, "recompiled within one width bucket"

    # identical inputs → identical loss (padding is inert)
    d3 = dict(data, msr3d_prompt=base_prompts)
    loss3 = float(np.asarray(model.forward(d3)["loss"]).mean())
    np.testing.assert_allclose(loss1, loss3, rtol=1e-6)
