"""Headline benchmark: Flat exact search QPS/chip at SIFT1M scale.

Workload: BASELINE.json config 2 — corpus 1M × 128-dim fp32, query batch 48,
k=10, fused distance+top-k (the reference's hot path, Index::search via
src/faiss_extension.cpp:629-638).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: ratio against a CPU brute-force stand-in for the reference's
FAISS-CPU path (BLAS sgemm + partial select via numpy), measured on this
host on a corpus subsample and scaled linearly to the full corpus size —
the reference publishes no absolute numbers (BASELINE.md), so the baseline
is measured, not quoted.
"""

import json
import sys
import time

import numpy as np

N, D, NQ, K = 1_000_000, 128, 48, 10
BASELINE_SUBSAMPLE = 131_072


def measure_tpu_qps() -> float:
    import duckdb_faiss_ext_tpu as dfx
    from duckdb_faiss_ext_tpu.catalog import Catalog

    dfx.set_precision("fast")
    rng = np.random.default_rng(42)
    xb = rng.standard_normal((N, D), dtype=np.float32)
    xq = rng.standard_normal((NQ, D), dtype=np.float32)

    cat = Catalog()
    dfx.faiss_create("bench", D, "Flat", metric_type="L2", catalog=cat)
    dfx.faiss_add(xb, "bench", catalog=cat)

    # Warmup: device upload + jit compile.
    dfx.faiss_search("bench", K, xq, catalog=cat)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        dfx.faiss_search("bench", K, xq, catalog=cat)
    dt = time.perf_counter() - t0
    return NQ * iters / dt


def measure_cpu_baseline_qps() -> float:
    rng = np.random.default_rng(7)
    xb = rng.standard_normal((BASELINE_SUBSAMPLE, D), dtype=np.float32)
    xq = rng.standard_normal((NQ, D), dtype=np.float32)
    xb_norms = (xb * xb).sum(axis=1)

    def run():
        d = xb_norms[None, :] - 2.0 * (xq @ xb.T)
        idx = np.argpartition(d, K, axis=1)[:, :K]
        part = np.take_along_axis(d, idx, axis=1)
        order = np.argsort(part, axis=1)
        return np.take_along_axis(idx, order, axis=1)

    run()  # warmup
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = time.perf_counter() - t0
    per_batch = dt / iters * (N / BASELINE_SUBSAMPLE)  # scale to full corpus
    return NQ / per_batch


def main():
    tpu_qps = measure_tpu_qps()
    cpu_qps = measure_cpu_baseline_qps()
    print(json.dumps({
        "metric": "flat_search_qps_sift1m_k10_b48",
        "value": round(tpu_qps, 2),
        "unit": "queries/s/chip",
        "vs_baseline": round(tpu_qps / cpu_qps, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
