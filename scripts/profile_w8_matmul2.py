"""w8 matmul probe, round-3 harness style (profile_decode_matmul.py):
one fori_loop chaining 2 matmuls/iter (4096->11008->4096), min-of-3
value-sync timings — adds a Pallas-kernel arm next to the XLA dequant
arm so the comparison shares the exact loop the 0.279 ms round-3 number
came from."""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed(fn, *args, iters=3):
    fn(*args)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--b", type=int, default=80)
    p.add_argument("--loop", type=int, default=50)
    p.add_argument("--block-k", type=int, default=512)
    p.add_argument("--block-n", type=int, default=1024)
    args = p.parse_args()
    b, m, n, L = args.b, 4096, 11008, args.loop

    from msr3d_tpu.ops.pallas.w8_matmul import matmul_w8

    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(b, m)).astype(np.float32), jnp.bfloat16)
    wq = jnp.asarray(r.integers(-127, 127, size=(m, n)).astype(np.int8))
    scale = jnp.asarray(r.uniform(0.9, 1.1, size=(n,)).astype(np.float32))
    wq2 = jnp.asarray(r.integers(-127, 127, size=(n, m)).astype(np.int8))
    scale2 = jnp.asarray(r.uniform(0.9, 1.1, size=(m,)).astype(np.float32))

    @jax.jit
    def loop_xla(x, w, s, w2, s2):
        def body(i, c):
            y = jnp.dot(c, w.astype(jnp.bfloat16)) * s.astype(jnp.bfloat16)
            z = jnp.dot(y, w2.astype(jnp.bfloat16)) * s2.astype(jnp.bfloat16)
            return jnp.tanh(z)

        return lax.fori_loop(0, L, body, x)

    @jax.jit
    def loop_pallas(x, w, s, w2, s2):
        def body(i, c):
            y = matmul_w8(c, w, s, block_k=args.block_k, block_n=args.block_n)
            z = matmul_w8(y, w2, s2, block_k=args.block_k, block_n=args.block_n)
            return jnp.tanh(z)

        return lax.fori_loop(0, L, body, x)

    bytes_int8 = m * n + n * m
    t = timed(loop_xla, x, wq, scale, wq2, scale2) / L
    print(f"b={b} xla dequant : {t*1e6:8.1f} us/iter "
          f"({bytes_int8/t/1e9:6.1f} GB/s streamed, floor 819)", flush=True)
    t = timed(loop_pallas, x, wq, scale, wq2, scale2) / L
    print(f"b={b} pallas w8   : {t*1e6:8.1f} us/iter "
          f"({bytes_int8/t/1e9:6.1f} GB/s streamed)", flush=True)


if __name__ == "__main__":
    main()
