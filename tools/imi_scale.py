"""IMI-at-scale drive: measured comparison of IMI2xb vs IVFn on one chip.

The IMI selling point is coarse training cost: 2^b-way k-means per half
instead of 4^b-way k-means, while search still probes a 4^b-cell space.
This script measures train time, build rate, QPS, and self-recall on a
clustered corpus for an IMI index and an IVF index with the same number of
lists.  Run on the real TPU:

    env PYTHONPATH=/root/repo:/root/.axon_site python tools/imi_scale.py

(One TPU process at a time; see .claude/skills/verify/SKILL.md.)
"""

import sys
import time

import numpy as np

import duckdb_faiss_ext_tpu as dfx
from duckdb_faiss_ext_tpu.catalog import Catalog


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt:.2f}s")
    return out, dt


def fetch_sync(res):
    # Through the relay, block_until_ready is a no-op; the result dict is
    # already host-side numpy after faiss_search.
    return res


def main(n=500_000, d=96, nbits=7, nq=48, k=10):
    nlist = 1 << (2 * nbits)
    rng = np.random.default_rng(0)
    ncent = 1024
    centers = rng.standard_normal((ncent, d)).astype(np.float32) * 3
    xb = (centers[rng.integers(0, ncent, n)]
          + rng.standard_normal((n, d)).astype(np.float32) * 0.5)
    xq = xb[:nq]
    print(f"corpus {n}x{d}, IMI2x{nbits} = {nlist} cells vs IVF{nlist}")

    results = {}
    for name, desc in (("imi", f"IMI2x{nbits},Flat"),
                       ("ivf", f"IVF{nlist},Flat")):
        cat = Catalog()
        dfx.faiss_create(name, d, desc, metric_type="L2", catalog=cat)
        ix = cat.get(name).index
        _, t_train = timed(f"{desc} train", lambda: ix.train(xb))
        _, t_add = timed(f"{desc} add", lambda: ix.add(xb))
        pm = {"nprobe": str(max(1, nlist // 64))}
        # warmup/compile
        dfx.faiss_search(name, k, xq, pm, catalog=cat)
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            res = dfx.faiss_search(name, k, xq, pm, catalog=cat)
        dt = (time.perf_counter() - t0) / reps
        qps = nq / dt
        rec = float((res["label"][:, 0] == np.arange(nq)).mean())
        print(f"  {desc}: b{nq} nprobe={pm['nprobe']} {qps:.0f} qps, "
              f"self-hit@1 {rec:.2f}")
        results[name] = dict(train_s=t_train, add_s=t_add, qps=qps,
                             selfhit=rec)
    speedup = results["ivf"]["train_s"] / max(results["imi"]["train_s"],
                                              1e-9)
    print(f"train speedup IMI vs IVF at {nlist} lists: {speedup:.1f}x")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    main(n=n)
