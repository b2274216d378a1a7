"""Decode-step roofline decomposition on the real chip.

Findings from the 2026-08 profiling session (v5e, tunneled):
  - XLA already fuses the int8 dequant into single-use dots; rewriting
    LoraDense as dot-then-scale REGRESSED end-to-end QA (7.36 -> 5.79/s).
  - Back-to-back dots in one program stream at ~700 GB/s; a lone dot per
    loop iteration pays a ~110 us pipeline-fill, so per-dot "latency"
    microbenches overstate cost ~5x. Trust bench_qa.py, not microbenches.
  - Merging LoRA into the base at inference (--merged-lora) removes 448
    tiny dots/step: decode 29 -> 21.6 ms/step, ~+5%% QA end to end.
  - Host RNG inside the timed loop and tunnel D2H (~0.5 s first-fetch,
    ~50 MB/s) dominate naive measurements; keep host work out of the
    timed region.

Microbenches the per-step HBM traffic suspects behind the ~3x gap between
measured marginal decode (34 ms/tok int8 b16) and the weight-read roofline:

  1. bf16 matmul  (B,K)@(K,N)            -> baseline GB/s
  2. int8 weight, dequant-then-dot       -> current LoraDense formulation
  3. int8 weight, dot-then-scale         -> scale moved outside the dot
  4. int8 weight + int8 activations      -> native s8 MXU dot
  5. attention cache read at S=256       -> KV traffic
  6. cache dynamic_update_slice          -> aliasing check

Each case loops inside one jit (lax.fori_loop with a data dependency) so
dispatch overhead vanishes; time/iter = wall / iters.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

ITERS = 1000


def timed(fn, *args):
    # NOTE: on the tunneled axon backend, block_until_ready can return
    # before remote execution finishes — force a VALUE fetch to sync.
    f = jax.jit(fn)
    float(jnp.sum(f(*args).astype(jnp.float32)))
    t0 = time.perf_counter()
    float(jnp.sum(f(*args).astype(jnp.float32)))
    return (time.perf_counter() - t0) / ITERS


def loop(body, x0):
    def fn(x):
        return lax.fori_loop(0, ITERS, lambda i, c: body(c), x)

    return fn


def main():
    print("devices:", jax.devices())
    B, K, N = 16, 4096, 4096
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, K)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(K, N)), jnp.bfloat16)
    wq = jnp.asarray(rng.integers(-127, 127, size=(K, N)), jnp.int8)
    s = jnp.asarray(rng.normal(size=(N,)) ** 2 + 0.5, jnp.bfloat16)

    bytes_bf16 = K * N * 2
    bytes_int8 = K * N

    # chain each output back into the input to keep the loop data-dependent
    def bf16_body(c):
        y = c @ w
        return y * jnp.bfloat16(1e-4) @ w.T * jnp.bfloat16(1e-4) + c
    t1 = timed(loop(bf16_body, x), x) / 2  # two matmuls per iter
    print(f"bf16 dot           : {t1*1e3:7.3f} ms  {bytes_bf16/t1/1e9:7.1f} GB/s")

    def deq_body(c):
        kern = wq.astype(jnp.bfloat16) * s
        y = c @ kern
        return y * jnp.bfloat16(1e-4) @ kern.T * jnp.bfloat16(1e-4) + c
    t2 = timed(loop(deq_body, x), x) / 2
    print(f"int8 dequant-dot   : {t2*1e3:7.3f} ms  {bytes_int8/t2/1e9:7.1f} GB/s eff")

    def scale_after_body(c):
        y = (c @ wq.astype(jnp.bfloat16)) * s
        back = (y * jnp.bfloat16(1e-4)) @ wq.astype(jnp.bfloat16).T
        return back * jnp.bfloat16(1e-4) + c
    t3 = timed(loop(scale_after_body, x), x) / 2
    print(f"int8 dot-then-scale: {t3*1e3:7.3f} ms  {bytes_int8/t3/1e9:7.1f} GB/s eff")

    def s8s8_body(c):
        cq = jnp.clip(jnp.round(c * 16.0), -127, 127).astype(jnp.int8)
        y = lax.dot_general(
            cq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        yb = y.astype(jnp.bfloat16) * s * jnp.bfloat16(1 / 16.0)
        back = jnp.clip(jnp.round(yb * jnp.bfloat16(1e-4)), -127, 127).astype(jnp.int8)
        y2 = lax.dot_general(
            back, wq.T, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return y2.astype(jnp.bfloat16) * jnp.bfloat16(1e-4) + c
    t4 = timed(loop(s8s8_body, x), x) / 2
    print(f"int8 s8xs8 dot     : {t4*1e3:7.3f} ms  {bytes_int8/t4/1e9:7.1f} GB/s eff")

    # 5. attention read: (B,H,1,D)x(B,H,S,D) + (B,H,S)(B,H,S,D)
    H, S, D = 32, 256, 128
    q = jnp.asarray(rng.normal(size=(B, H, 1, D)), jnp.bfloat16)
    kc = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.bfloat16)
    vc = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.bfloat16)
    kv_bytes = 2 * B * H * S * D * 2

    def attn_body(c):
        a = jnp.einsum("bhqd,bhkd->bhqk", c, kc) * jnp.bfloat16(1 / np.sqrt(D))
        p = jax.nn.softmax(a.astype(jnp.float32), axis=-1).astype(jnp.bfloat16)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, vc)
        return c + o * jnp.bfloat16(1e-4)
    t5 = timed(loop(attn_body, q), q)
    print(f"attn read S={S}    : {t5*1e3:7.3f} ms  {kv_bytes/t5/1e9:7.1f} GB/s")

    # 6. cache update aliasing: full (L,2,B,H,S,D) cache, one slice written/step
    L = 32
    cache = jnp.zeros((L, 2, B, H, S, D), jnp.bfloat16)
    newkv = jnp.asarray(rng.normal(size=(L, 2, B, H, 1, D)), jnp.bfloat16)

    def upd_body(c):
        return lax.dynamic_update_slice(c, newkv + c[:, :, :, :, :1] * jnp.bfloat16(1e-4), (0, 0, 0, 0, 5, 0))
    t6 = timed(loop(upd_body, cache), cache)
    written = np.prod(newkv.shape) * 2
    print(f"cache dus (alias?) : {t6*1e3:7.3f} ms  wrote {written/1e6:.2f} MB "
          f"(full cache {cache.nbytes/1e9:.2f} GB -> copy would take {cache.nbytes*2/820e9*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
