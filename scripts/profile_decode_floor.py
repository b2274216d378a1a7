"""Decode-bandwidth floor: the three-point decomposition (VERDICT r4 #2).

The decode step at 7B int8 runs ~19-24 ms against 6.7 GB of weights +
1-2 GB KV ≈ 330-430 GB/s effective vs the v5e's ~819 GB/s HBM. Round 4
attributed the gap to the VPU int8->bf16 convert ("~4 ops/element")
without measuring it. This harness measures each term on the device:

  1. i8-stream      : one pass over the full 32-layer int8 weight set,
                      xor-with-carry + max-reduce (1 VPU op/element, no
                      convert) -- the DMA-side floor.
  2. i8-convert     : same pass, astype(bf16) * per-channel scale +
                      max-reduce -- adds exactly the convert work the
                      dequant-matmul pays.
  3. i8-matmul B=r  : the real decode formulation, x @ (w.astype(bf16)
                      * scale), chained through the 7-matmul transformer
                      skeleton (q,k,v,o,gate,up,down) x 32 layers.
  4. bf16-stream    : BYTE-MATCHED control -- 16 bf16 layers = the same
                      6.7 GB but HALF the elements. If throughput is
                      byte-bound (pure DMA), this takes the same time as
                      (1); if element-bound (VPU), it halves.
  5. bf16-matmul    : byte-matched matmul control, 16 layers.

Interpretation:
  (1) ~= HBM roofline and (2) >> (1)  -> convert IS the floor: write the
      closure in BASELINE.md, stop optimizing the dequant.
  (2) ~= (1) but (3) >> (2)           -> the matmul FORMULATION wastes
      bandwidth: a fused/double-buffered kernel is worth the round.
  (4) at the same GB/s as (1)         -> byte-bound; int8 already rides
      the DMA floor (then int4 should halve the pass -- reconcile with
      the round-3 int4-parity datapoint).
  (4) at the same Gelem/s as (1)      -> element-bound; consistent with
      int4 parity.

Weights are threaded as ARGUMENTS (not closures) so deleting a set
actually frees HBM (the jit cache retains closure constants). Every
loop body depends on the carry (xor / +scalar / activation chain) so
XLA cannot hoist the weight reads out of the fori_loop; sync is by
VALUE fetch (block_until_ready returns early through the axon tunnel).

Usage: python scripts/profile_decode_floor.py [--rows 8 32] [--passes 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

H, F, L = 4096, 11008, 32  # 7B geometry

# per-layer matmul weights, decode order: q k v o gate up down
LAYER_SHAPES = [(H, H)] * 4 + [(H, F), (H, F), (F, H)]


def build_weight_set(n_layers: int, dtype_name: str) -> list:
    """n_layers x 7 distinct device buffers (one host block per shape,
    device_put per copy -- distinct HBM buffers, instant host-side)."""
    import jax
    import ml_dtypes

    r = np.random.default_rng(0)
    host = {}
    for shp in set(LAYER_SHAPES):
        if dtype_name == "int8":
            host[shp] = r.integers(-127, 128, size=shp).astype(np.int8)
        else:
            host[shp] = (r.normal(size=shp) * 0.02).astype(
                ml_dtypes.bfloat16
            )
    return [
        [jax.device_put(host[s]) for s in LAYER_SHAPES]
        for _ in range(n_layers)
    ]


def timed_call(f, *fargs) -> float:
    """Seconds for one call of jitted f (which loops `passes` inside);
    compile+warm first, sync by value fetch."""
    import jax.numpy as jnp

    float(jnp.sum(f(*fargs).astype(jnp.float32)))  # compile + sync
    t0 = time.perf_counter()
    float(jnp.sum(f(*fargs).astype(jnp.float32)))
    return time.perf_counter() - t0


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
    p.add_argument("--rows", type=int, nargs="+", default=[8, 32])
    p.add_argument("--passes", type=int, default=8)
    p.add_argument("--bf16-layers", type=int, default=16,
                   help="byte-matched bf16 control (16 x 2B = 32 x 1B)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    dev = str(jax.devices()[0])
    results = {"device": dev, "passes": args.passes}
    r = np.random.default_rng(1)
    scales = {
        shp: jax.device_put(
            ((r.uniform(0.5, 1.5, size=(shp[1],)) / 127)
             .astype(np.float32)))
        for shp in set(LAYER_SHAPES)
    }
    P = args.passes

    def report(name, sec_total, gbytes, gelems):
        sec = sec_total / P
        results[name] = {
            "ms_per_pass": round(sec * 1e3, 2),
            "gbps": round(gbytes / sec, 1),
            "gelems_per_s": round(gelems / sec, 1),
        }
        print(f"{name:18s} {sec*1e3:8.2f} ms/pass   "
              f"{gbytes/sec:7.1f} GB/s   {gelems/sec:7.1f} Gelem/s",
              flush=True)

    @jax.jit
    def i8_stream(acc0, ws):
        def body(_, acc):
            a = acc
            for layer in ws:
                for w in layer:
                    a = jnp.max(w ^ a)  # carry-dep: no hoisting
            return a
        return lax.fori_loop(0, P, body, acc0)

    @jax.jit
    def i8_convert(acc0, ws, sc):
        def body(_, acc):
            a = acc
            for layer in ws:
                for w, shp in zip(layer, LAYER_SHAPES):
                    d = w.astype(jnp.bfloat16) * sc[shp[1]].astype(
                        jnp.bfloat16)
                    a = jnp.max(d + a)
            return a
        return lax.fori_loop(0, P, body, acc0)

    def make_matmul(int8: bool):
        @jax.jit
        def run(x0, ws, sc):
            def dq(w, n):
                if not int8:
                    return w
                return w.astype(jnp.bfloat16) * sc[n].astype(jnp.bfloat16)

            def body(_, x):
                xc = x
                for layer in ws:
                    wq, wk, wv, wo, wg, wu, wd = layer
                    y = xc @ dq(wq, H) + xc @ dq(wk, H) + xc @ dq(wv, H)
                    y = y @ dq(wo, H)
                    h = (y @ dq(wg, F)) * (y @ dq(wu, F))
                    xc = h @ dq(wd, H)
                    # rmsnorm-ish rescale keeps the chain finite
                    xc = xc * lax.rsqrt(
                        jnp.mean(xc.astype(jnp.float32) ** 2) + 1.0
                    ).astype(xc.dtype)
                return xc
            return lax.fori_loop(0, P, body, x0)
        return run

    sc_by_n = {H: scales[(H, H)], F: scales[(H, F)]}

    # ---- int8 arms -------------------------------------------------------
    w_i8 = build_weight_set(L, "int8")
    elems = sum(a * b for a, b in LAYER_SHAPES) * L
    gbytes_i8 = elems / 1e9
    print(f"int8 set: {L} layers, {elems/1e9:.2f} G elements "
          f"= {gbytes_i8:.2f} GB", flush=True)

    report("i8-stream", timed_call(i8_stream, jnp.int8(3), w_i8),
           gbytes_i8, elems / 1e9)
    report("i8-convert",
           timed_call(i8_convert, jnp.bfloat16(0.1), w_i8, sc_by_n),
           gbytes_i8, elems / 1e9)

    mm_i8 = make_matmul(int8=True)
    for b in args.rows:
        x0 = jnp.asarray((np.random.default_rng(2).normal(size=(b, H))
                          * 0.1).astype(np.float32)).astype(jnp.bfloat16)
        report(f"i8-matmul-b{b}", timed_call(mm_i8, x0, w_i8, sc_by_n),
               gbytes_i8, elems / 1e9)

    del w_i8  # args, not closures: HBM actually frees

    # ---- byte-matched bf16 arms -----------------------------------------
    lb = args.bf16_layers
    w_bf = build_weight_set(lb, "bf16")
    elems_bf = sum(a * b for a, b in LAYER_SHAPES) * lb
    gbytes_bf = elems_bf * 2 / 1e9
    print(f"bf16 set: {lb} layers, {elems_bf/1e9:.2f} G elements "
          f"= {gbytes_bf:.2f} GB (byte-matched to int8 set)", flush=True)

    @jax.jit
    def bf_stream(acc0, ws):
        def body(_, acc):
            a = acc
            for layer in ws:
                for w in layer:
                    a = jnp.max(w + a)
            return a
        return lax.fori_loop(0, P, body, acc0)

    report("bf16-stream",
           timed_call(bf_stream, jnp.bfloat16(0.1), w_bf),
           gbytes_bf, elems_bf / 1e9)

    mm_bf = make_matmul(int8=False)
    for b in args.rows:
        x0 = jnp.asarray((np.random.default_rng(2).normal(size=(b, H))
                          * 0.1).astype(np.float32)).astype(jnp.bfloat16)
        report(f"bf16-matmul-b{b}", timed_call(mm_bf, x0, w_bf, sc_by_n),
               gbytes_bf, elems_bf / 1e9)

    del w_bf

    # ---- int4 split-nibble arms (the byte-bound 2x candidate) -----------
    # packed layout = LoraDense bits=4: (K/2, N) int8, low nibbles = input
    # rows [0, K/2), high = [K/2, K). If the matmul arm runs at ~half the
    # int8 pass time, int4 realizes the byte win; if it matches int8, the
    # unpack is materializing temps (the round-3 "int4 parity" mystery).
    w_i4 = []
    rr = np.random.default_rng(3)
    host4 = {
        shp: rr.integers(-128, 128, size=(shp[0] // 2, shp[1])).astype(
            np.int8)
        for shp in set(LAYER_SHAPES)
    }
    for _ in range(L):
        w_i4.append([jax.device_put(host4[s]) for s in LAYER_SHAPES])
    gbytes_i4 = elems / 2 / 1e9

    @jax.jit
    def i4_stream(acc0, ws):
        def body(_, acc):
            a = acc
            for layer in ws:
                for w in layer:
                    a = jnp.max(w ^ a)
            return a
        return lax.fori_loop(0, P, body, acc0)

    print(f"int4 set: {L} layers packed = {gbytes_i4:.2f} GB", flush=True)
    report("i4-stream", timed_call(i4_stream, jnp.int8(3), w_i4),
           gbytes_i4, elems / 1e9)

    @jax.jit
    def i4_matmul(x0, ws, sc):
        def dq_halves(wp):
            lo = jnp.right_shift(jnp.left_shift(wp, 4), 4)
            hi = jnp.right_shift(wp, 4)
            return lo, hi

        def mm(xc, wp, n):
            half = wp.shape[0]
            lo, hi = dq_halves(wp)
            s = sc[n].astype(jnp.bfloat16)
            return (xc[:, :half] @ lo.astype(jnp.bfloat16)
                    + xc[:, half:] @ hi.astype(jnp.bfloat16)) * s

        def body(_, x):
            xc = x
            for layer in ws:
                wq, wk, wv, wo, wg, wu, wd = layer
                y = mm(xc, wq, H) + mm(xc, wk, H) + mm(xc, wv, H)
                y = mm(y, wo, H)
                h = mm(y, wg, F) * mm(y, wu, F)
                xc = mm(h, wd, H)
                xc = xc * lax.rsqrt(
                    jnp.mean(xc.astype(jnp.float32) ** 2) + 1.0
                ).astype(xc.dtype)
            return xc
        return lax.fori_loop(0, P, body, x0)

    for b in args.rows:
        x0 = jnp.asarray((np.random.default_rng(2).normal(size=(b, H))
                          * 0.1).astype(np.float32)).astype(jnp.bfloat16)
        report(f"i4-matmul-b{b}", timed_call(i4_matmul, x0, w_i4, sc_by_n),
               gbytes_i4, elems / 1e9)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
