"""Pallas w4 dequant matmul vs the XLA int4/int8 lowerings — full 7B
weight set, chained (same methodology as profile_decode_floor.py, so
numbers are directly comparable to its arms):

  i8-matmul (floor run, 2026-08-19):   12.1-12.6 ms/pass  (byte-bound)
  i4-matmul XLA (floor run):           12.6-13.0 ms/pass  (byte win lost)
  i4-stream (floor run):                8.6 ms/pass       (the target)

If the Pallas kernel lands near the int4 stream floor it is a ~1.45x
win on the decode weight-read term AND frees 3.24 GB of HBM.

Usage: python scripts/profile_w4_matmul.py [--rows 8 32 80] [--passes 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

H, F, L = 4096, 11008, 32
LAYER_SHAPES = [(H, H)] * 4 + [(H, F), (H, F), (F, H)]


def _enable_cache():
    # persistent XLA compile cache (utils/compile_cache.py): the 7B
    # programs cost 80-550 s to compile; share one on-disk cache across
    # every entry point so reruns and retries skip it
    try:
        from msr3d_tpu.utils.compile_cache import enable_compile_cache
        enable_compile_cache()
    except Exception:
        pass


_enable_cache()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, nargs="+", default=[8, 32, 80])
    p.add_argument("--passes", type=int, default=8)
    p.add_argument("--block-kp", type=int, default=512)
    p.add_argument("--block-n", type=int, default=512)
    p.add_argument("--unpack", default="f32",
                   help="unpack mode (bf16|f32|i16); the axon v5e AOT "
                   "helper rejects bf16 (no bf16 ALU on its LLO target)")
    p.add_argument("--probe-only", action="store_true",
                   help="compile+run ONE small matmul and exit (fast "
                   "check that the unpack mode legalizes on this target)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from msr3d_tpu.ops.pallas.w4_matmul import matmul_w4

    if args.probe_only:
        r0 = np.random.default_rng(0)
        xp = jnp.asarray(r0.normal(size=(8, 1024)).astype(np.float32) * 0.1
                         ).astype(jnp.bfloat16)
        wp = jax.device_put(
            r0.integers(-128, 128, size=(512, 1024)).astype(np.int8))
        sp = jax.device_put((r0.uniform(0.5, 1.5, size=(1024,)) / 7
                             ).astype(np.float32))
        t0 = time.time()
        y = matmul_w4(xp, wp, sp, block_kp=args.block_kp,
                      block_n=args.block_n, unpack=args.unpack)
        y.block_until_ready()
        print(json.dumps({"probe": "ok", "unpack": args.unpack,
                          "compile_s": round(time.time() - t0, 1),
                          "sum": float(jnp.sum(y.astype(jnp.float32)))}),
              flush=True)
        return

    P = args.passes
    r = np.random.default_rng(0)
    # weights STACKED per projection and scanned: tracing 32 inlined
    # layers x 7 pallas calls = 224 Mosaic kernel instances blows the
    # compile budget (the first fori_loop variant timed out at 20 min);
    # scan traces the body once -> 7 instances. Same 3.24 GB, same
    # per-pass HBM traffic.
    def stacked(k, n):
        return jax.device_put(
            r.integers(-128, 128, size=(L, k // 2, n)).astype(np.int8))

    wq_s, wk_s, wv_s, wo_s = (stacked(H, H) for _ in range(4))
    wg_s, wu_s = (stacked(H, F) for _ in range(2))
    wd_s = stacked(F, H)
    weights = (wq_s, wk_s, wv_s, wo_s, wg_s, wu_s, wd_s)
    scales = {
        n: jax.device_put(
            ((r.uniform(0.5, 1.5, size=(n,)) / 7).astype(np.float32)))
        for n in (H, F)
    }
    elems = sum(a * b for a, b in LAYER_SHAPES) * L
    gbytes = elems / 2 / 1e9
    print(f"int4 packed set: {gbytes:.2f} GB, {elems/1e9:.2f} G elements",
          flush=True)

    results = {"device": str(jax.devices()[0]), "passes": P,
               "block_kp": args.block_kp, "block_n": args.block_n,
               "unpack": args.unpack}

    def mm(xc, wp, n):
        return matmul_w4(xc, wp, scales[n], block_kp=args.block_kp,
                         block_n=args.block_n, unpack=args.unpack)

    @jax.jit
    def chain(x0, ws, sc):
        def layer(x, lw):
            wq, wk, wv, wo, wg, wu, wd = lw
            y = mm(x, wq, H) + mm(x, wk, H) + mm(x, wv, H)
            y = mm(y, wo, H)
            h = mm(y, wg, F) * mm(y, wu, F)
            xc = mm(h, wd, H)
            xc = xc * lax.rsqrt(
                jnp.mean(xc.astype(jnp.float32) ** 2) + 1.0
            ).astype(xc.dtype)
            return xc, None

        def body(_, x):
            out, _ = lax.scan(layer, x, ws)
            return out
        return lax.fori_loop(0, P, body, x0)

    for b in args.rows:
        x0 = jnp.asarray((np.random.default_rng(2).normal(size=(b, H))
                          * 0.1).astype(np.float32)).astype(jnp.bfloat16)
        float(jnp.sum(chain(x0, weights, scales).astype(jnp.float32)))
        t0 = time.perf_counter()
        float(jnp.sum(chain(x0, weights, scales).astype(jnp.float32)))
        sec = (time.perf_counter() - t0) / P
        results[f"pallas-w4-b{b}"] = {
            "ms_per_pass": round(sec * 1e3, 2),
            "gbps": round(gbytes / sec, 1),
            "gelems_per_s": round(elems / 1e9 / sec, 1),
        }
        print(f"pallas-w4-b{b:<4d} {sec*1e3:8.2f} ms/pass   "
              f"{gbytes/sec:7.1f} GB/s   {elems/1e9/sec:7.1f} Gelem/s",
              flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
