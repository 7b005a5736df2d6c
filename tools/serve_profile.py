"""Decompose the public-API serving call: relay floor vs upload vs
device compute vs corpus-size-dependent work.

The flat 1M x 128 b1024 call measures ~90 ms through the API while the
distance+top-k kernel models at ~3 ms — this tool localizes the gap
without internal instrumentation by scaling the inputs:

* rtt            — tiny-fetch round trip (per-call floor);
* upload         — jnp.asarray(queries) + block (host->device);
* api @ N        — full faiss_search at corpus sizes N and N/8: if the
                   time barely moves with N the call is overhead-bound,
                   if ~8x it is corpus-compute-bound;
* api @ b1/b48/b1024 — batch scaling (per-call fixed cost);
* pipelined      — faiss_search_batched 16 batches (amortized floor).

Usage: env PYTHONPATH=/root/repo:/root/.axon_site \
    tools/chiplock.sh 900 python tools/serve_profile.py
"""

from __future__ import annotations

import time

import numpy as np


def best_of(fn, iters=5):
    fn()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main() -> None:
    import jax.numpy as jnp

    import duckdb_faiss_ext_tpu as dfx
    from duckdb_faiss_ext_tpu.catalog import Catalog
    from duckdb_faiss_ext_tpu.harness.datasets import synthetic_dataset

    dfx.set_precision("fast")
    cat = Catalog()
    k = 10

    x8 = jnp.ones((8, 8))
    np.asarray(x8 @ x8)
    rtt = best_of(lambda: np.asarray(x8 @ x8), 7)
    print(f"rtt: {rtt:.1f} ms", flush=True)

    xb, xq_all = synthetic_dataset(1_000_000, 128, nq=1024, seed=42)
    up = best_of(lambda: jnp.asarray(xq_all).block_until_ready(), 5)
    print(f"upload 1024x128 queries: {up:.1f} ms", flush=True)

    for n in (1_000_000, 131_072):
        name = f"flat{n}"
        dfx.faiss_create(name, 128, "Flat", metric_type="L2", catalog=cat)
        dfx.faiss_add(xb[:n], name, catalog=cat)
        for b in (1, 48, 1024):
            xq = xq_all[:b]
            t = best_of(lambda: dfx.faiss_search(name, k, xq, catalog=cat))
            print(f"flat n={n} b={b}: {t:7.1f} ms ({b / t * 1e3:8.1f} qps)",
                  flush=True)
        big = np.tile(xq_all, (4, 1))
        t = best_of(lambda: dfx.faiss_search_batched(
            name, k, big, batch_size=1024, catalog=cat), 3)
        print(f"flat n={n} pipelined 4xb1024: {t:7.1f} ms "
              f"({big.shape[0] / t * 1e3:8.1f} qps)", flush=True)

    # IVF: same decomposition at nprobe 64
    dfx.faiss_create("ivf", 128, "IVF4096,Flat", metric_type="L2",
                     catalog=cat)
    dfx.faiss_manual_train(xb[:262_144], "ivf", catalog=cat)
    dfx.faiss_add(xb, "ivf", catalog=cat)
    params = {"nprobe": "64"}
    for b in (48, 1024):
        xq = xq_all[:b]
        t = best_of(lambda: dfx.faiss_search("ivf", k, xq, params,
                                             catalog=cat))
        print(f"ivf b={b} nprobe=64: {t:7.1f} ms ({b / t * 1e3:8.1f} qps)",
              flush=True)
    print("SERVE-PROFILE COMPLETE", flush=True)


if __name__ == "__main__":
    main()
