"""On-chip A/B of the pair-tile kernel at its target regime.

Builds a spill-free device-resident IVF,SQ index at a marco-like shape
(default 2M x 1536, IVF1024 -> lmax 4096, capacity 2x corpus) and times
b1024 serving three ways: pair-tile kernel / per-query DMA kernel / XLA
gather scan.  No spill region, no ground-truth pass — this isolates the
padded-scan kernel the 8.8M runs are bound by.

Usage (real TPU): env PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/pairs_ab.py [--n 2000000] [--d 1536] [--storage SQ8]
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--d", type=int, default=1536)
    ap.add_argument("--nlist", type=int, default=1024)
    ap.add_argument("--storage", default="SQ8")
    ap.add_argument("--nprobe", type=int, default=16)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import duckdb_faiss_ext_tpu as dfx
    from duckdb_faiss_ext_tpu.catalog import GLOBAL_CATALOG
    from duckdb_faiss_ext_tpu.models.ivf import IVFIndex

    dfx.set_precision("fast")
    n, d, chunk = args.n, args.d, 131072
    key = jax.random.PRNGKey(args.seed)
    kc, kq = jax.random.split(key)
    centers = jax.random.normal(kc, (2048, d), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("m",))
    def gen(i, m: int):
        ki = jax.random.fold_in(kq, i)
        k1, k2 = jax.random.split(ki)
        cid = jax.random.randint(k1, (m,), 0, 2048)
        x = centers[cid] + jax.random.normal(k2, (m, d), jnp.float32)
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    name = "pab"
    dfx.faiss_create_params(name, d, f"IVF{args.nlist},{args.storage}",
                            {"assign_topk": "4"},
                            metric_type="INNER_PRODUCT")
    t0 = time.time()
    dfx.faiss_train_device(gen(0, chunk)[:131072], name)
    print(f"train: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    for i in range(-(-n // chunk)):
        m = min(chunk, n - i * chunk)
        dfx.faiss_add_device(gen(i, chunk)[:m], name, expected_total=n)
    idx = GLOBAL_CATALOG.get(name).index
    print(f"ingest: {time.time() - t0:.1f}s ({n/(time.time()-t0):.0f} "
          f"vec/s); lmax {idx._dr.lmax}, spill_n {idx._dr.spill_n}",
          flush=True)

    xq = np.asarray(gen(7, 1024))
    params = {"nprobe": str(args.nprobe)}

    def timed(label):
        dfx.faiss_search(name, 10, xq, params)     # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            r = dfx.faiss_search(name, 10, xq, params)
            best = min(best, time.time() - t0)
        print(f"  {label:12s} b1024 nprobe={args.nprobe}: "
              f"{best*1e3:7.1f} ms  ({1024/best:6.0f} qps)", flush=True)
        return best, r

    dfx.set_kernel_mode("pallas")
    saved = (IVFIndex.PAIRS_MIN_BATCH, IVFIndex.PAIRS_MIN_WORK)
    try:
        IVFIndex.PAIRS_MIN_WORK = 0
        t_pr, r_pr = timed("pairs")
        IVFIndex.PAIRS_MIN_BATCH = 10 ** 9
        t_pq, r_pq = timed("per-query")
        dfx.set_kernel_mode("xla")
        t_x, r_x = timed("xla gather")
    finally:
        (IVFIndex.PAIRS_MIN_BATCH, IVFIndex.PAIRS_MIN_WORK) = saved
        dfx.set_kernel_mode("auto")
    agree = float(np.mean([len(set(a) & set(b)) / 10 for a, b in
                           zip(r_pr["label"], r_pq["label"])]))
    print(f"pairs vs per-query: {t_pq/t_pr:.2f}x   vs xla: "
          f"{t_x/t_pr:.2f}x   label-agree {agree:.4f}", flush=True)
    print("PAIRS-AB COMPLETE", flush=True)


if __name__ == "__main__":
    main()
