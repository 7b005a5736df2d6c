"""Three-strategy filtered search at the reference's own benchmark scale.

The reference's entire benchmark suite is filtered search over the
8,841,823-row ``ids`` table with ``sel = i % 100`` and passrates 1-99%
(/root/reference/go/benches_c.go:31,124-201, go/main_test.go:18-51):

* post  — faiss_search with the binomial-enlarged k', then WHERE;
* sel   — faiss_search_filter (dense bitmap, O(n) mask build per call);
* set   — faiss_search_filter_set (id set, O(m)).

This tool rebuilds the marco-scale device-resident IVF,SQ8 index (same
flow as tools/marco_diag.py) and runs the harness's three-strategy sweep
against a registered 8.8M-row id table — the reference's methodology at
the reference's corpus size, with the bitmap fused into the Pallas pairs
and spill kernels (ops/pallas_ivf_pairs.py, ops/ivf_scan.py).

Also covers BASELINE config 4 (1M rows, ``id%2==0``) when run with
``--config4``: a 1M x 128 IVF4096 host-ingest index, selector vs
post-filter at 50% selectivity.

Usage (real TPU):
  env PYTHONPATH=/root/repo:/root/.axon_site python tools/marco_filtered.py \
      [--passrates 1,10,50,99] [--nq 48] [--nprobe 16] [--config4]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def run_sweep(index_name, xq, n, nprobe, passrates, want=10, iters=3):
    import duckdb_faiss_ext_tpu as dfx
    from duckdb_faiss_ext_tpu.harness import run_filtered_bench

    dfx.register_table("ids", {"id": np.arange(n, dtype=np.int64)})
    params = {"nprobe": str(nprobe)} if nprobe else None
    results = run_filtered_bench(index_name, xq, "ids", "id",
                                 passrates=passrates, want=want,
                                 params=params, iters=iters,
                                 cpu_baseline=True, cpu_n=n)
    print(f"{'passrate':>9} {'k_req':>7} {'post_qps':>10} {'sel_qps':>10} "
          f"{'set_qps':>10} {'cpu_qps':>9}", flush=True)
    for r in results:
        print(f"{r.passrate:9.2f} {r.required_k:7d} {r.qps_post:10.1f} "
              f"{r.qps_sel:10.1f} {r.qps_set:10.1f} "
              f"{(r.qps_cpu or 0):9.2f}", flush=True)
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passrates", default="1,10,50,99")
    ap.add_argument("--nq", type=int, default=48)
    ap.add_argument("--nprobe", type=int, default=16)
    ap.add_argument("--want", type=int, default=10)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--config4", action="store_true",
                    help="run only BASELINE config 4: 1M x 128 IVF4096, "
                         "id%%2==0 selector vs post-filter")
    ap.add_argument("--n", type=int, default=8_841_823,
                    help="corpus rows (shrink for CPU smoke tests)")
    ap.add_argument("--nlist", type=int, default=4096)
    args = ap.parse_args()

    import duckdb_faiss_ext_tpu as dfx

    passrates = [int(p) / 100 for p in args.passrates.split(",")]
    rng = np.random.default_rng(11)

    if args.config4:
        # BASELINE config 4: 1M rows, id%2==0 (50% selectivity), host
        # ingest path (512 MB fp32 — fine through the relay).
        from duckdb_faiss_ext_tpu.harness import (required_k,
                                                  synthetic_dataset)

        n, d = 1_000_000, 128
        xb, xq = synthetic_dataset(n=n, d=d, nq=args.nq)
        ids = np.arange(n, dtype=np.int64)
        t0 = time.time()
        dfx.faiss_create("c4", d, "IVF4096,Flat", metric_type="L2")
        dfx.faiss_add((ids, xb), "c4")
        print(f"config4 build IVF4096,Flat 1Mx128: {time.time()-t0:.1f}s",
              flush=True)
        dfx.register_table("ids", {"id": ids})
        params = {"nprobe": str(args.nprobe)}
        kp = required_k(args.want, 0.5)

        def post():
            res = dfx.faiss_search("c4", kp, xq, params)
            return res["label"] % 2 == 0

        def sel():
            return dfx.faiss_search_filter("c4", args.want, xq, "id%2==0",
                                           "id", "ids", params)

        def sset():
            return dfx.faiss_search_filter_set("c4", args.want, xq,
                                               "id%2==0", "id", "ids",
                                               params)

        for label, fn in (("post (k'=%d)" % kp, post), ("sel", sel),
                          ("set", sset)):
            fn()
            best = float("inf")
            for _ in range(args.iters):
                t0 = time.time()
                fn()
                best = min(best, time.time() - t0)
            print(f"  config4 id%2==0 {label:14s}: {best*1e3:7.1f} ms "
                  f"({args.nq/best:7.1f} qps)", flush=True)
        print("MARCO-FILTERED COMPLETE", flush=True)
        return

    # Full marco scale: reuse marco_device's device-resident build.
    sys.argv = ["marco_device.py", "--storage", "SQ8", "--metric", "IP",
                "--unit-norm", "--assign-topk", "4", "--budget-gb", "14.0",
                "--n", str(args.n), "--nlist", str(args.nlist),
                "--nprobes", str(args.nprobe), "--batches", str(args.nq),
                "--skip-gt"]
    import runpy

    runpy.run_path("tools/marco_device.py", run_name="__main__")

    xq = rng.standard_normal((args.nq, 1536)).astype(np.float32)
    xq /= np.linalg.norm(xq, axis=1, keepdims=True)
    dfx.set_precision("fast")
    run_sweep("marco", xq, args.n, args.nprobe, passrates,
              want=args.want, iters=args.iters)
    print("MARCO-FILTERED COMPLETE", flush=True)


if __name__ == "__main__":
    main()
