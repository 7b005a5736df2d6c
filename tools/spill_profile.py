"""Decompose the IVF spill-scan cost at the marco shape, on-chip.

The round-3 diag (tools/marco_diag.py, BASELINE.md) measured the spill
scan at ~0.27 us/row for the 8.8M x 1536 SQ8 layout's 1.05M-row spill at
b1024 — ~10x the bf16-MXU digit-dot floor.  The suspected cost is NOT
the einsum: the per-chunk probed-list membership (one-hot row gather +
(sc, nq) -> (nq, sc) transpose) moves ~16M bools through a lane
transpose every chunk.  This tool times, at the same shape:

  A. ivf_spill_scan, membership="cmp"    (nprobe equality compares)
  B. ivf_spill_scan, membership="gather" (the round-2 path)
  C. bare bf16 digit-dot einsum over the same rows (compute+DMA floor)
  D. membership compare-loop alone

Everything is generated on-device (no 1.5 GB relay upload).

Usage (real TPU):
  env PYTHONPATH=/root/repo:/root/.axon_site python tools/spill_profile.py \
      [--n 1048576] [--nq 1024] [--nprobe 16] [--d 1536] [--metric IP]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0])


def best_of(fn, iters=3):
    fn()  # compile + warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


import jax  # noqa: E402  (after docstring for fetch())
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_048_576)
    ap.add_argument("--nq", type=int, default=1024)
    ap.add_argument("--nprobe", type=int, default=16)
    ap.add_argument("--d", type=int, default=1536)
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--metric", default="IP", choices=["IP", "L2"])
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from duckdb_faiss_ext_tpu.ops.ivf_scan import ivf_spill_scan
    from duckdb_faiss_ext_tpu.utils.config import config

    n, nq, nprobe, d, nlist = (args.n, args.nq, args.nprobe, args.d,
                               args.nlist)
    metric = "INNER_PRODUCT" if args.metric == "IP" else "L2"
    key = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(key, 3)

    payload = jax.random.randint(k1, (n, d), 0, 256, jnp.uint8)
    assign = jax.random.randint(k2, (n,), 0, nlist, jnp.int32)
    pos = jnp.arange(n, dtype=jnp.int32)
    xq = jax.random.normal(k3, (nq, d), jnp.float32)
    xq = xq / jnp.linalg.norm(xq, axis=1, keepdims=True)
    probe_ids = jax.random.randint(jax.random.PRNGKey(11), (nq, nprobe),
                                   0, nlist, jnp.int32)
    vmin = jnp.full((d,), -1.0, jnp.float32)
    scale = jnp.full((d,), 2.0 / 255.0, jnp.float32)
    centroids = jnp.zeros((nlist, d), jnp.float32)

    # Row norms/sums on device, CHUNKED (a whole-payload fp32 cast is a
    # 6.4 GB intermediate next to the 1.5 GB payload — FAILED_PRECONDITION
    # on-chip 2026-08-20).  Semantics match models/ivf_layout.py:
    # rn = Σ(scale·c)², rs = Σ c (raw code sum).
    @jax.jit
    def _chunk_stats(blk):
        cf = blk.astype(jnp.float32)
        sc_ = scale[None, :] * cf
        return jnp.sum(sc_ * sc_, axis=1), jnp.sum(cf, axis=1)

    ch = 131072
    parts = [_chunk_stats(payload[i:i + ch]) for i in range(0, n, ch)]
    rn = jnp.concatenate([p[0] for p in parts])
    rs = jnp.concatenate([p[1] for p in parts])
    del parts

    marg = jnp.asarray(0.0, jnp.float32)
    print(f"spill profile: n={n} d={d} sq8 nq={nq} nprobe={nprobe} "
          f"nlist={nlist} {metric}", flush=True)

    def run(ms, via=None, want_result=False):
        def f():
            s, p = ivf_spill_scan(
                payload, assign, pos, centroids, None, probe_ids, xq,
                None, marg, k=args.k, metric=metric,
                precision=lax.Precision.DEFAULT, sq="sq8",
                sq_vmin=vmin, sq_scale=scale, n_used=n,
                spill_rn=rn, spill_rs=rs, int8_dot=True,
                int8_via=via or config.spill_int8_via, membership=ms)
            if want_result:
                return np.asarray(p)
            fetch(s)
        return f

    res = {}
    for ms in ("cmp", "gather"):
        t = best_of(run(ms), args.iters)
        res[ms] = t
        print(f"  ivf_spill_scan membership={ms:7s}: {t * 1e3:8.1f} ms "
              f"({t * 1e9 / n:.3f} us/row/b{nq})", flush=True)

    # VERDICT r3 #8: settle spill_int8_via with one clean same-session
    # A/B (the two prior cross-session diags disagreed).
    for via in ("bf16", "int32"):
        t = best_of(run("cmp", via=via), args.iters)
        print(f"  ivf_spill_scan int8_via={via:6s}: {t * 1e3:8.1f} ms",
              flush=True)

    # Fused Pallas dense spill scan (ops/pallas_spill.py).
    from duckdb_faiss_ext_tpu.ops.pallas_spill import pallas_spill_search
    from duckdb_faiss_ext_tpu.utils.config import on_tpu

    def run_pallas(want_result=False):
        s, p = pallas_spill_search(
            payload, assign, pos, probe_ids, xq, None, k=args.k,
            metric=metric, sq="sq8", sq_vmin=vmin, sq_scale=scale,
            spill_rn=rn, spill_rs=rs, n_used=n,
            interpret=not on_tpu(), digit_dtype="bf16")
        if want_result:
            return np.asarray(p)
        fetch(s)

    try:
        t = best_of(run_pallas, args.iters)
        print(f"  pallas_spill_search          : {t * 1e3:8.1f} ms "
              f"({t * 1e9 / n:.3f} us/row/b{nq})", flush=True)
        ref_pos = run("cmp", want_result=True)()
        pal_pos = run_pallas(want_result=True)
        agree = float(np.mean([
            len(set(ref_pos[q]) & set(pal_pos[q])) / max(
                1, (ref_pos[q] >= 0).sum())
            for q in range(nq)]))
        print(f"  pallas-vs-xla label agreement: {agree:.4f}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"  pallas_spill_search FAILED: {type(e).__name__}: "
              f"{str(e)[:140]}", flush=True)

    # C: bare digit-dot floor — the same bf16 dots the scan runs, chunked
    # identically, with only a running max (no membership, no topk).
    sc = 16384

    @jax.jit
    def floor_fn(payload, xq):
        u = xq * scale[None, :]
        hi = jnp.clip(jnp.round(u * 64), -127, 127).astype(jnp.int8)

        def body(i, acc):
            blk = lax.dynamic_slice(payload, (i * sc, 0), (sc, d))
            xc = (blk.astype(jnp.int8) ^ jnp.int8(-128)).astype(
                jnp.bfloat16)
            qb2 = jnp.concatenate([hi, hi], axis=0).astype(jnp.bfloat16)
            dot2 = jnp.einsum("qd,cd->qc", qb2, xc,
                              preferred_element_type=jnp.float32)
            return jnp.maximum(acc, jnp.max(dot2[:nq], axis=1))

        return lax.fori_loop(0, n // sc, body,
                             jnp.full((nq,), -jnp.inf, jnp.float32))

    t = best_of(lambda: fetch(floor_fn(payload, xq)), args.iters)
    print(f"  bare bf16 digit-dot floor    : {t * 1e3:8.1f} ms", flush=True)

    # D: membership compare-loop alone, chunked identically.
    @jax.jit
    def member_fn(assign, probe_ids):
        def body(i, acc):
            asg = lax.dynamic_slice(assign, (i * sc,), (sc,))
            probed = probe_ids[:, 0:1] == asg[None, :]
            for j in range(1, nprobe):
                probed = jnp.logical_or(
                    probed, probe_ids[:, j:j + 1] == asg[None, :])
            return acc + jnp.sum(probed.astype(jnp.int32))

        return lax.fori_loop(0, n // sc, body, jnp.int32(0))

    t = best_of(lambda: fetch(member_fn(assign, probe_ids)), args.iters)
    print(f"  membership cmp-loop alone    : {t * 1e3:8.1f} ms", flush=True)
    print(f"SPILL PROFILE COMPLETE  cmp/gather = "
          f"{res['gather'] / max(res['cmp'], 1e-9):.2f}x", flush=True)


if __name__ == "__main__":
    main()
