"""BatchingServer: results match per-batch generate, partial final batch
is padded+dropped, pipelining preserves id order."""

import numpy as np
import pytest

from msr3d_tpu.serving import BatchingServer, Result
from tests.test_msr3d import tiny_data_dict


def _requests(rng, n):
    base = tiny_data_dict(rng, b=2)
    out = []
    for i in range(n):
        out.append(
            {
                "msr3d_prompt": base["msr3d_prompt"][i % 2],
                **{
                    k: base[k][i % 2]
                    for k in (
                        "obj_fts", "obj_masks", "obj_locs",
                        "anchor_locs", "anchor_orientation",
                        "msr3d_imgs", "msr3d_img_masks",
                    )
                },
            }
        )
    return out


def test_serving_matches_direct_generate(tiny_msr3d, rng):
    reqs = _requests(rng, 5)  # batch 2 → 2 full batches + 1 partial
    server = BatchingServer(
        tiny_msr3d, batch_size=2, pipeline_depth=1,
        use_beam=False, max_new_tokens=5,
    )
    results = list(server.run(iter(reqs)))
    assert [r.id for r in sorted(results, key=lambda r: r.id)] == list(range(5))
    assert len(results) == 5

    # direct generate on the first full batch must give the same tokens
    direct = tiny_msr3d.generate(
        {
            "msr3d_prompt": [reqs[0]["msr3d_prompt"], reqs[1]["msr3d_prompt"]],
            **{
                k: np.stack([reqs[0][k], reqs[1][k]])
                for k in (
                    "obj_fts", "obj_masks", "obj_locs",
                    "anchor_locs", "anchor_orientation",
                    "msr3d_imgs", "msr3d_img_masks",
                )
            },
        },
        use_beam=False,
        max_new_tokens=5,
    )
    by_id = {r.id: r for r in results}
    np.testing.assert_array_equal(by_id[0].output_tokens, direct["output_tokens"][0])
    np.testing.assert_array_equal(by_id[1].output_tokens, direct["output_tokens"][1])
    assert by_id[0].output_text == direct["output_text"][0]


def test_submit_flush_incremental(tiny_msr3d, rng):
    reqs = _requests(rng, 3)
    server = BatchingServer(
        tiny_msr3d, batch_size=2, pipeline_depth=2,
        use_beam=False, max_new_tokens=5,
    )
    for r in reqs:
        server.submit(r)
    results = server.flush()
    assert [r.id for r in results] == [0, 1, 2]
    assert all(isinstance(r, Result) and isinstance(r.output_text, str) for r in results)
    # flush is idempotent once drained
    assert server.flush() == []


@pytest.mark.slow  # beam compile on the tiny model
def test_serving_beam_path(tiny_msr3d, rng):
    reqs = _requests(rng, 2)
    server = BatchingServer(
        tiny_msr3d, batch_size=2, pipeline_depth=1,
        use_beam=True, max_new_tokens=4,
    )
    results = list(server.run(iter(reqs)))
    assert len(results) == 2
    assert all(isinstance(r.output_text, str) for r in results)


def test_serving_batch_size_one(tiny_msr3d, rng):
    reqs = _requests(rng, 2)
    server = BatchingServer(
        tiny_msr3d, batch_size=1, pipeline_depth=0,
        use_beam=False, max_new_tokens=4,
    )
    results = list(server.run(iter(reqs)))
    assert [r.id for r in results] == [0, 1]
