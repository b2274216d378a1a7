"""Microbench: Pallas fused w8 dequant matmul vs the XLA lowering.

The XLA arm is exactly LoraDense's int8 branch
(``x @ (wq.astype(bf16) * scale)``); round 3 measured it at 0.279 ms for
one (4096, 11008) matmul — ~161 GB/s effective weight read, 5× under the
v5e HBM roofline (~55 µs). Iterations chain on-device (the output
perturbs the next input) and sync by VALUE fetch — the axon-tunnel
timing rules from bench.py.

Usage: python scripts/profile_w8_matmul.py [--rows 8 32 80] [--iters 50]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, nargs="+", default=[8, 32, 80])
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--block-k", type=int, default=512)
    p.add_argument("--block-n", type=int, default=1024)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from msr3d_tpu.ops.pallas.w8_matmul import matmul_w8

    shapes = [(4096, 11008), (11008, 4096), (4096, 4096)]
    r = np.random.default_rng(0)

    for kdim, n in shapes:
        wq = jnp.asarray(
            r.integers(-127, 128, size=(kdim, n)).astype(np.int8)
        )
        scale = jnp.asarray(
            (r.uniform(0.5, 1.5, size=(n,)) / 127).astype(np.float32)
        ).astype(jnp.bfloat16)
        gbytes = kdim * n / 1e9

        for b in args.rows:
            x0 = jnp.asarray(
                (r.normal(size=(b, kdim)) * 0.1).astype(np.float32)
            ).astype(jnp.bfloat16)

            def chain(fn):
                @jax.jit
                def run(x):
                    def body(_, carry):
                        xc, acc = carry
                        y = fn(xc)
                        # feed a perturbation back so iterations serialize
                        bump = (
                            jnp.mean(y.astype(jnp.float32))
                            * jnp.bfloat16(1e-6)
                        ).astype(jnp.bfloat16)
                        xc = xc + bump
                        return xc, acc + jnp.sum(y.astype(jnp.float32))

                    _, acc = lax.fori_loop(
                        0, args.iters, body, (x, jnp.float32(0))
                    )
                    return acc

                return run

            def xla_fn(xc):
                kernel = wq.astype(jnp.bfloat16) * scale
                return xc @ kernel

            def pallas_fn(xc):
                return matmul_w8(
                    xc, wq, scale,
                    block_k=args.block_k, block_n=args.block_n,
                )

            # parity check first
            ya = np.asarray(xla_fn(x0), np.float32)
            yb = np.asarray(pallas_fn(x0), np.float32)
            rel = np.max(np.abs(ya - yb)) / (np.max(np.abs(ya)) + 1e-9)

            rows = {}
            for name, fn in (("xla", xla_fn), ("pallas", pallas_fn)):
                run = chain(fn)
                float(run(x0))  # compile + warm
                t0 = time.perf_counter()
                float(run(x0))
                dt = (time.perf_counter() - t0) / args.iters
                rows[name] = dt
            print(
                f"K={kdim} N={n} B={b}: xla {rows['xla']*1e3:.3f} ms "
                f"({gbytes/rows['xla']:.0f} GB/s) | pallas "
                f"{rows['pallas']*1e3:.3f} ms ({gbytes/rows['pallas']:.0f} "
                f"GB/s) | speedup {rows['xla']/rows['pallas']:.2f}x | "
                f"max rel diff {rel:.2e}",
                flush=True,
            )


if __name__ == "__main__":
    main()
