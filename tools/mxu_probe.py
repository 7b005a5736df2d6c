"""Per-grid-step cost probe for the pair-tile kernel's inner dot.

The pairs hot-list A/B (tools/pairs_profile.py, 2026-08-20) showed the
kernel is ~90% NON-DMA cost: with all tiles mapping 16 cached lists, the
scan still took 44.4 of 49.7 ms — ~20 us per tile where the int8-MXU
model predicts ~1.5 us.  Hypothesis: the (qg=8, wq) x (wq, lmax) int8
dot_general under-fills the MXU's (32, 128) int8 tile on the M side, or
Mosaic lowers small-M int8 dots off the MXU entirely.

This probe times ONE Pallas kernel per configuration: grid=(T,), every
step dotting VMEM-resident operands (constant index maps — after step 0
the DMA pipeline re-fetches nothing), so the per-step time is pure
compute + grid bookkeeping:

  per-step config grid over (M in {8, 16, 32, 64}, dtype in {i8, bf16}),
  with K=1536, N=1024, plus an epilogue-only and a noop step.

Usage (real TPU): env PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/mxu_probe.py [--t 2048] [--n 1024] [--k 1536]
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=2048, help="grid steps")
    ap.add_argument("--n", type=int, default=1024, help="rows per tile")
    ap.add_argument("--k", type=int, default=1536, help="contraction dim")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from duckdb_faiss_ext_tpu.utils.config import on_tpu

    interp = not on_tpu()
    T, N, K = args.t, args.n, args.k

    def timed(fn, *a):
        out = fn(*a)
        np.asarray(out[0, 0])
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            np.asarray(fn(*a)[0, 0])
            best = min(best, time.time() - t0)
        return best

    def probe(m, dtype, mode="dot"):
        """One kernel: grid (T,), per step dot (m, K) x (K, N) -> acc."""

        def kernel(q_ref, c_ref, o_ref):
            t = pl.program_id(0)

            @pl.when(t == 0)
            def _init():
                o_ref[...] = jnp.zeros_like(o_ref)

            if mode == "dot":
                d = lax.dot_general(
                    q_ref[...], c_ref[...], (((1,), (1,)), ((), ())),
                    preferred_element_type=(jnp.int32 if dtype == jnp.int8
                                            else jnp.float32))
                o_ref[...] += d[:, :128].astype(jnp.float32)
            elif mode == "epilogue":
                # the pairs kernel's fp32 epilogue shape: (m, N) elementwise
                s = q_ref[...].astype(jnp.float32)[:, :1] * \
                    c_ref[...].astype(jnp.float32)[:1, :m].T
                o_ref[...] += s[:, :128]
            else:  # noop
                o_ref[...] += jnp.float32(1.0)

        q = jnp.ones((m, K), dtype)
        c = jnp.ones((N, K), dtype)
        f = pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((m, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, 128), jnp.float32),
            interpret=interp,
        )
        return timed(jax.jit(f), q, c)

    def probe_noin(m):
        """Grid step with NO input windows at all — pure grid overhead."""

        def kernel(o_ref):
            o_ref[...] = jnp.full(o_ref.shape, 1.0, jnp.float32) \
                * pl.program_id(0).astype(jnp.float32)

        f = pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[],
            out_specs=pl.BlockSpec((m, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, 128), jnp.float32),
            interpret=interp,
        )
        return timed(jax.jit(f))

    print(f"mxu probe: grid T={T}, dot (M, {K}) x ({K}, {N})", flush=True)
    t_ni = probe_noin(8)
    print(f"  no-input step          : {t_ni * 1e6 / T:8.2f} us/step "
          f"({t_ni * 1e3:.1f} ms total)", flush=True)
    t_noop = probe(8, jnp.int8, "noop")
    print(f"  noop step              : {t_noop * 1e6 / T:8.2f} us/step "
          f"({t_noop * 1e3:.1f} ms total)  [c window {N}x{K} int8 = "
          f"{N * K / (1 << 20):.1f} MB resident]", flush=True)
    for dtype, name in ((jnp.int8, "int8"), (jnp.bfloat16, "bf16")):
        for m in (8, 16, 32, 64, 128):
            try:
                t = probe(m, dtype)
            except Exception as e:  # noqa: BLE001
                print(f"  dot M={m:4d} {name}: FAILED "
                      f"{type(e).__name__}: {str(e)[:100]}", flush=True)
                continue
            macs = m * N * K * T
            print(f"  dot M={m:4d} {name}: {t * 1e6 / T:8.2f} us/step  "
                  f"({macs / t / 1e12:6.1f} T MAC/s)", flush=True)
    print("MXU-PROBE COMPLETE", flush=True)


if __name__ == "__main__":
    main()
