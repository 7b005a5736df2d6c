"""Graph-walk vs IVF-partition drive for the HNSW surface, on one chip.

Measures, at scale (default 400k x 96), through the public faiss_search API
(end-to-end: upload queries, search, fetch):

* build time: CAGRA-style graph (exact-kNN scan + augment) vs the internal
  IVF partition (k-means + assign);
* QPS and recall@10 vs the exact scan across efSearch, at batch 48 and 1024;
* both uniform and clustered corpora (IVF recall on uniform data is known
  poor — the graph walk is the fix).

Run on the real TPU (ONE process at a time):

    env PYTHONPATH=/root/repo:/root/.axon_site python tools/graph_scale.py
"""

import os
import sys
import time

import numpy as np

import duckdb_faiss_ext_tpu as dfx
from duckdb_faiss_ext_tpu.catalog import Catalog


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt:.1f}s", flush=True)
    return out, dt


def qps_of(name, cat, k, xq, params, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        res = dfx.faiss_search(name, k, xq, params, catalog=cat)
        best = min(best, time.perf_counter() - t0)
    return len(xq) / best, res


def recall_of(got, truth, k):
    return float(np.mean([len(set(g[g >= 0]) & set(t)) / k
                          for g, t in zip(got["label"], truth)]))


def drive(tag, xb, xq, k=10, m_conn=32, modes=("graph", "ivf")):
    n, d = xb.shape
    print(f"== {tag}: {n}x{d}, nq={len(xq)}, HNSW{m_conn} ==", flush=True)
    truth = None
    for mode in modes:
        cat = Catalog()
        name = f"h_{mode}"
        dfx.faiss_create_params(name, d, f"HNSW{m_conn}", {"accel": mode},
                                metric_type="L2", catalog=cat)
        ix = cat.get(name).index
        ix.ann_threshold = min(ix.ann_threshold, max(1000, n // 4))
        gmax = os.environ.get("DFX_GRAPH_MAX")
        if gmax and mode == "graph":
            # Force the clustered (top-2-list + NN-descent) build path at
            # sub-threshold scale for on-chip measurement.
            ix.graph_max = int(gmax)
        _, t_add = timed(f"{mode} add ({n/1e3:.0f}k rows)",
                         lambda: dfx.faiss_add(xb, name, catalog=cat))
        # Force the ANN build now so it isn't billed to the first search.
        _, t_build = timed(
            f"{mode} ANN build",
            lambda: (ix._graph_ready() if mode == "graph"
                     else ix._accel_ready()))
        if truth is None:
            # The oracle must be fp32-exact: a fast-precision (bf16) oracle
            # disagrees with any bf16 searcher on near-ties, capping
            # measured "recall" at the precision-agreement rate (~0.86 on
            # clustered 400k x 96) regardless of true quality.
            dfx.set_precision("parity")
            dfx.faiss_search(name, k, xq[:48], {"exact": "true"},
                             catalog=cat)  # compile
            truth_res, _ = timed("exact fp32 oracle (b=all)",
                                 lambda: dfx.faiss_search(
                                     name, k, xq, {"exact": "true"},
                                     catalog=cat))
            truth = [row[row >= 0] for row in truth_res["label"]]
            dfx.set_precision("fast")
        for ef in (16, 32, 64, 128):
            params = {"efSearch": str(ef)}
            dfx.faiss_search(name, k, xq[:48], params, catalog=cat)  # compile
            q48, r48 = qps_of(name, cat, k, xq[:48], params)
            dfx.faiss_search(name, k, xq, params, catalog=cat)       # compile
            qbig, rbig = qps_of(name, cat, k, xq, params)
            rec = recall_of(rbig, truth, k)
            print(f"  {mode} ef={ef:4d}: b48 {q48:8.0f} qps | "
                  f"b{len(xq)} {qbig:8.0f} qps | recall@{k} {rec:.3f}",
                  flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    which = sys.argv[3] if len(sys.argv) > 3 else "both"
    m_conn = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    modes = (tuple(sys.argv[5].split(","))
             if len(sys.argv) > 5 else ("graph", "ivf"))
    nq = 1024
    dfx.set_precision("fast")
    rng = np.random.default_rng(0)

    if which in ("uniform", "both"):
        xb_u = rng.standard_normal((n, d)).astype(np.float32)
        xq_u = rng.standard_normal((nq, d)).astype(np.float32)
        drive("uniform", xb_u, xq_u, m_conn=m_conn, modes=modes)
        del xb_u, xq_u

    if which in ("clustered", "both"):
        ncent = 1024
        centers = rng.standard_normal((ncent, d)).astype(np.float32) * 3
        xb_c = (centers[rng.integers(0, ncent, n)]
                + rng.standard_normal((n, d)).astype(np.float32) * 0.5)
        xq_c = (centers[rng.integers(0, ncent, nq)]
                + rng.standard_normal((nq, d)).astype(np.float32) * 0.5)
        drive("clustered", xb_c, xq_c, m_conn=m_conn, modes=modes)


if __name__ == "__main__":
    main()
