"""Answer the reference's batch-amortization claim with measured numbers.

README.md:87 (reference): "a batch of 48 queries is only ~25% slower than
a single query" — i.e. per-BATCH latency grows slowly with batch size
because fixed per-call cost dominates.  This tool measures b1 / b48 /
b1024 / pipelined on-chip for the SIFT1M-class flat and IVF indexes
(BASELINE configs 2-3) and reports both views: per-batch latency ratio
(the reference's claim) and QPS.

Usage (real TPU):
  env PYTHONPATH=/root/repo:/root/.axon_site \
      tools/chiplock.sh 1800 python tools/batch_amortization.py
"""

from __future__ import annotations

import time

import numpy as np


def best_ms(fn, iters=7):
    fn()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main() -> None:
    import duckdb_faiss_ext_tpu as dfx
    from duckdb_faiss_ext_tpu.harness.datasets import synthetic_dataset

    dfx.set_precision("fast")
    n, d, k = 1_000_000, 128, 10
    xb, xq_all = synthetic_dataset(n, d, nq=1024, seed=42)

    dfx.faiss_create("flat", d, "Flat", metric_type="L2")
    dfx.faiss_add(xb, "flat")
    dfx.faiss_create("ivf", d, "IVF4096,Flat", metric_type="L2")
    dfx.faiss_manual_train(xb[:262_144], "ivf")
    dfx.faiss_add(xb, "ivf")
    params_ivf = {"nprobe": "64"}

    print(f"{'index':>6} {'batch':>9} {'ms/batch':>9} {'qps':>9} "
          f"{'vs b1 latency':>14}", flush=True)
    for name, params in (("flat", None), ("ivf", params_ivf)):
        base_ms = None
        for b in (1, 48, 256, 1024):
            q = xq_all[:b]
            t = best_ms(lambda q=q: dfx.faiss_search(name, k, q, params))
            if b == 1:
                base_ms = t
            print(f"{name:>6} {b:>9} {t:9.1f} {b / t * 1e3:9.1f} "
                  f"{t / base_ms:13.2f}x", flush=True)
        # pipelined: 16 b48 batches in flight (single-fetch tier)
        big = xq_all[np.arange(16 * 48) % 1024]
        dfx.faiss_search_batched(name, k, big, params, batch_size=48)
        t0 = time.perf_counter()
        for _ in range(3):
            dfx.faiss_search_batched(name, k, big, params, batch_size=48)
        dt = (time.perf_counter() - t0) / 3
        print(f"{name:>6} {'16xb48':>9} {dt * 1e3 / 16:9.1f} "
              f"{big.shape[0] / dt:9.1f} {'(pipelined)':>14}", flush=True)
    print("BATCH-AMORTIZATION COMPLETE", flush=True)


if __name__ == "__main__":
    main()
