"""Compile + run ONE small mega-step pairs call on the real chip with
full tracebacks — captures the Mosaic error that the relay's compile
helper reports only as HTTP 500 (seen 2026-08-20 in master3b), and
label-checks against the grid kernel when it does lower.

Usage: env PYTHONPATH=/root/repo:/root/.axon_site \
    JAX_TRACEBACK_FILTERING=off python tools/mega_debug.py [--flat]
"""

from __future__ import annotations

import argparse

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--flat", action="store_true")
    ap.add_argument("--nlist", type=int, default=64)
    ap.add_argument("--lmax", type=int, default=256)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--nq", type=int, default=64)
    ap.add_argument("--nprobe", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from duckdb_faiss_ext_tpu.ops import pallas_ivf_pairs as pp
    from duckdb_faiss_ext_tpu.utils.config import on_tpu

    interp = not on_tpu()
    print(f"backend: {jax.devices()[0].platform}, interpret={interp}",
          flush=True)
    nlist, lmax, d, nq, nprobe = (args.nlist, args.lmax, args.d, args.nq,
                                  args.nprobe)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    counts = jnp.full((nlist,), lmax, jnp.int32)
    row_pos = jnp.arange(nlist * lmax, dtype=jnp.int32).reshape(nlist,
                                                                lmax)
    xq = jax.random.normal(k2, (nq, d), jnp.float32)
    probe_ids = jax.random.randint(k3, (nq, nprobe), 0, nlist, jnp.int32)

    if args.flat:
        payload = jax.random.normal(k1, (nlist, lmax, d), jnp.float32)
        kw = dict(k=10, k_scan=40, nprobe=nprobe, metric="INNER_PRODUCT")
        r1 = pp.pallas_ivf_pairs_search(payload, counts, row_pos,
                                        probe_ids, xq, None,
                                        interpret=interp, **kw)
        r2 = pp.pallas_ivf_pairs_search(payload, counts, row_pos,
                                        probe_ids, xq, None, mega=True,
                                        interpret=interp, **kw)
    else:
        payload = jax.random.randint(k1, (nlist, lmax, d), 0, 256,
                                     jnp.uint8)
        rn = jax.random.uniform(k2, (nlist, lmax), jnp.float32, 100, 200)
        rs = jax.random.uniform(k2, (nlist, lmax), jnp.float32, 50, 100)
        vmin = jnp.full((d,), -0.03, jnp.float32)
        scale = jnp.full((d,), 0.06 / 255, jnp.float32)
        kw = dict(k=10, k_scan=40, nprobe=nprobe,
                  metric="INNER_PRODUCT", codec="sq8")
        r1 = pp.pallas_ivf_sq_pairs_search(
            payload, rn, rs, counts, row_pos, vmin, scale, probe_ids,
            xq, None, interpret=interp, **kw)
        r2 = pp.pallas_ivf_sq_pairs_search(
            payload, rn, rs, counts, row_pos, vmin, scale, probe_ids,
            xq, None, mega=True, digit_dtype="bf16", interpret=interp,
            **kw)
    a = float(np.mean([len(set(x) & set(y)) / 10
                       for x, y in zip(np.asarray(r1[1]),
                                       np.asarray(r2[1]))]))
    print(f"mega vs grid label agreement: {a:.4f}", flush=True)
    print("MEGA-DEBUG COMPLETE", flush=True)


if __name__ == "__main__":
    main()
