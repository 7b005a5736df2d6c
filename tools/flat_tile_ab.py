"""Same-process A/B of flat-kernel tilings, kernel-only (device-resident
inputs, scalar fetch) — relay drift made cross-run serve_profile numbers
uncomparable (2026-08-20: the same config measured 47 and 105 ms an hour
apart).

Usage: env PYTHONPATH=/root/repo:/root/.axon_site \
    tools/chiplock.sh 900 python tools/flat_tile_ab.py [--n 1048576]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_048_576)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--nq", type=int, default=1024)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from duckdb_faiss_ext_tpu.ops.pallas_topk import _pallas_topk

    n, d, nq, k = args.n, args.d, args.nq, args.k
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    xb = jax.random.normal(k1, (n, d), jnp.float32)
    xq = jax.random.normal(k2, (nq, d), jnp.float32)
    nvalid = jnp.int32(n)

    combos = [(128, 2048), (128, 4096), (64, 4096), (64, 8192),
              (256, 2048), (512, 1024), (1024, 1024), (32, 8192)]
    ref = None
    for qt, nt in combos:
        if nq % qt or n % nt or 2 * nt * d * 4 + qt * nt * 4 > (14 << 20):
            continue
        try:
            def run():
                s, p = _pallas_topk(xb, nvalid, xq, None, k=k,
                                    metric="L2", qt=qt, nt=nt,
                                    precision=jax.lax.Precision.DEFAULT)
                return np.asarray(p)
            p = run()
            if ref is None:
                ref = p
            agree = float((p == ref).mean())
            best = float("inf")
            for _ in range(args.iters):
                t0 = time.time()
                run()
                best = min(best, time.time() - t0)
            steps = (nq // qt) * (n // nt)
            print(f"  qt={qt:4d} nt={nt:5d} steps={steps:5d}: "
                  f"{best * 1e3:7.1f} ms  agree={agree:.4f}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  qt={qt:4d} nt={nt:5d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)
    print("FLAT-TILE-AB COMPLETE", flush=True)


if __name__ == "__main__":
    main()
