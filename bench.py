"""Benchmark: scene-encode throughput on the flagship MSR3D scene encoder.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extra}.

Primary metric (BASELINE.json): scene-encode ms/scene at the reference
configuration — 60 objects × 1024 points × 6 dims per scene, PointNet++
(32/16/GroupAll SA stages, 768-d) + 3 spatial-attention layers (hidden 256,
cond fusion) — fully jitted, batched on device, no host round-trips per
scene.

``vs_baseline`` compares against the previous round's recorded value when a
BENCH_r*.json exists (ratio >1 = faster than last round); 1.0 on the first
round. The reference repo publishes no timing numbers (SURVEY.md §6), so
cross-framework speedup is tracked via the north-star QA-pairs/s/chip once
the full pipeline benchmark lands.
"""

from __future__ import annotations

import glob
import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from msr3d_tpu.models.ose3d_situation import OSE3DConfig, OSE3DSituation

    B = 16  # scenes per batch
    N_OBJ, N_PTS = 60, 1024

    model = OSE3DSituation(OSE3DConfig())  # reference msr3d.yaml scale
    rng = np.random.default_rng(0)
    batch = dict(
        obj_fts=jnp.asarray(
            (rng.normal(size=(B, N_OBJ, N_PTS, 6)) * 0.3).astype(np.float32)
        ),
        obj_masks=jnp.asarray(np.ones((B, N_OBJ), bool)),
        obj_locs=jnp.asarray(rng.normal(size=(B, N_OBJ, 6)).astype(np.float32)),
        anchor_locs=jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32)),
        anchor_orientation=jnp.asarray(
            np.tile(np.array([0, 0, 0, 1], np.float32), (B, 1))
        ),
    )

    variables = jax.jit(lambda k, b: model.init(k, **b))(jax.random.key(0), batch)

    # Iterations chain on-device (each feeds a perturbation of its output
    # into the next input) so neither result caching nor async dispatch can
    # fake the timing; sync is a VALUE fetch — on the tunneled axon backend
    # block_until_ready can return before remote execution finishes.
    iters = 10

    @jax.jit
    def run(v, b):
        def body(i, carry):
            fts, acc = carry
            out = model.apply(
                v,
                obj_fts=fts,
                obj_masks=b["obj_masks"],
                obj_locs=b["obj_locs"],
                anchor_locs=b["anchor_locs"],
                anchor_orientation=b["anchor_orientation"],
            )["obj_tokens"]
            bump = jnp.mean(out).astype(fts.dtype) * jnp.float32(1e-6)
            return fts + bump, acc + jnp.sum(out.astype(jnp.float32))
        import jax.lax as lax
        _, acc = lax.fori_loop(0, iters, body, (b["obj_fts"], jnp.float32(0)))
        return acc

    float(run(variables, batch))  # compile + sync
    batch2 = dict(batch, obj_fts=batch["obj_fts"] + 0.01)
    t0 = time.perf_counter()
    float(run(variables, batch2))
    dt = time.perf_counter() - t0

    ms_per_scene = dt / (iters * B) * 1000.0
    scenes_per_sec = iters * B / dt

    # vs_baseline: ratio against the previous recorded round (higher = faster)
    prev = None
    for path in sorted(glob.glob("BENCH_r*.json")):
        try:
            with open(path) as f:
                rec = json.load(f)
            if rec.get("metric") == "scene_encode_ms_per_scene":
                prev = rec.get("value")
        except Exception:
            pass
    vs_baseline = (prev / ms_per_scene) if prev else 1.0

    print(
        json.dumps(
            {
                "metric": "scene_encode_ms_per_scene",
                "value": round(ms_per_scene, 4),
                "unit": "ms/scene",
                "vs_baseline": round(vs_baseline, 4),
                "scenes_per_sec": round(scenes_per_sec, 2),
                "batch": B,
                "objects_per_scene": N_OBJ,
                "points_per_object": N_PTS,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
