"""Decode-matmul roofline probe (TPU v5e).

The decode step streams every frozen weight once per token step. At the
record config (b80) each 4096x11008 matmul moves 90 MB bf16 / 45 MB int8
of weights; the HBM floor at ~819 GB/s is ~110 / ~55 us. Round-3 notes
measured ~0.28-0.29 ms via the bench-model microbench — this script
isolates whether that gap is real matmul cost or measurement artifact
(dispatch, chaining, activation residency), by timing a long on-device
`lax.fori_loop` of chained matmuls with a value-sync fetch.

Variants: bf16 weights; int8 weights dequantized inside the loop
(per-channel scale applied to the OUTPUT, the scale-outside trick);
int8 weights with jax.lax.dot int8xbf16 mixed input (XLA chooses).
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed(fn, *args, iters=3):
    fn(*args)  # compile + warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))  # value sync (axon tunnel semantics)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--b", type=int, default=80)
    p.add_argument("--m", type=int, default=4096)
    p.add_argument("--n", type=int, default=11008)
    p.add_argument("--loop", type=int, default=50)
    args = p.parse_args()
    b, m, n, L = args.b, args.m, args.n, args.loop

    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(b, m)).astype(np.float32), jnp.bfloat16)
    wf = jnp.asarray(r.normal(size=(m, n)).astype(np.float32), jnp.bfloat16)
    wq = jnp.asarray(r.integers(-127, 127, size=(m, n)).astype(np.int8))
    scale = jnp.asarray(r.uniform(0.9, 1.1, size=(n,)).astype(np.float32))
    # second matmul back to m so the loop carry keeps shape (b, m)
    wf2 = jnp.asarray(r.normal(size=(n, m)).astype(np.float32), jnp.bfloat16)
    wq2 = jnp.asarray(r.integers(-127, 127, size=(n, m)).astype(np.int8))
    scale2 = jnp.asarray(r.uniform(0.9, 1.1, size=(m,)).astype(np.float32))

    @jax.jit
    def loop_bf16(x, w, w2):
        def body(i, c):
            y = jnp.dot(c, w)
            return jnp.tanh(jnp.dot(y, w2))

        return lax.fori_loop(0, L, body, x)

    @jax.jit
    def loop_int8_dequant(x, w, s, w2, s2):
        def body(i, c):
            y = jnp.dot(c, w.astype(jnp.bfloat16)) * s.astype(jnp.bfloat16)
            z = jnp.dot(y, w2.astype(jnp.bfloat16)) * s2.astype(jnp.bfloat16)
            return jnp.tanh(z)

        return lax.fori_loop(0, L, body, x)

    @jax.jit
    def loop_int8_mixed(x, w, s, w2, s2):
        def body(i, c):
            y = lax.dot_general(
                c, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * s
            y = y.astype(jnp.bfloat16)
            z = lax.dot_general(
                y, w2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * s2
            return jnp.tanh(z.astype(jnp.bfloat16))

        return lax.fori_loop(0, L, body, x)

    bytes_bf16 = 2 * (m * n + n * m)
    bytes_int8 = m * n + n * m

    t = timed(loop_bf16, x, wf, wf2) / L
    print(f"bf16:        {t*1e6:8.1f} us/iter  "
          f"({bytes_bf16/t/1e9:6.1f} GB/s streamed, floor 819)")
    t = timed(loop_int8_dequant, x, wq, scale, wq2, scale2) / L
    print(f"int8 dequant:{t*1e6:8.1f} us/iter  "
          f"({bytes_int8/t/1e9:6.1f} GB/s streamed)")
    t = timed(loop_int8_mixed, x, wq, scale, wq2, scale2) / L
    print(f"int8 mixed:  {t*1e6:8.1f} us/iter  "
          f"({bytes_int8/t/1e9:6.1f} GB/s streamed)")


if __name__ == "__main__":
    main()
