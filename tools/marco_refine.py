"""Exact-rerank (refine) tier at marco scale: break the SQ recall ceiling.

The reference's headline index stores raw fp32 vectors (HNSW,Flat — host
RAM), so its recall ceiling is 1.0; the TPU-native compressed-storage
serving tiers cap at the codec's quantization-conditional agreement
(SQ8 0.922, SQ6 ~0.91 at np128 — BASELINE r4).  faiss answers this with
IndexRefineFlat (``RFlat`` factory suffix): k·k_factor candidates from
the compressed base, re-scored against raw vectors.

At 8.8M × 1536 the raw store cannot live next to the 11 GiB SQ6 payload
in 16 GiB HBM — but this host has 125 GiB RAM, which is exactly where
the reference keeps ITS raw vectors.  So the refine tier is split like
the hardware wants: device = compressed candidate generation (SQ6 pairs
kernel, k_base candidates/query), host = fp16 raw store (27 GiB, fetched
once from the device-generated corpus and disk-cached) + a vectorised
numpy gather+rerank over k_base rows/query.  fp16 raw scores agree with
fp32 ordering to ~1e-3 relative — the measured ceiling becomes the
candidate recall@k_base of the base index, not the codec.

Reports recall@10 and qps for k_factor ∈ {4, 8, 16} at nprobe ∈ {16, 64}.

Usage (real TPU):
  env PYTHONPATH=/root/repo:/root/.axon_site \
      tools/chiplock.sh 6000 python tools/marco_refine.py [--storage SQ6]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

import numpy as np

STORE = "/root/repo/.marco_fp16_store_n{n}_d{d}_s{seed}_un.npy"


def build_host_store(n: int, d: int, seed: int, chunk: int = 65536,
                     clusters: int = 8192) -> np.ndarray:
    """Fetch the device-generated corpus once as fp16, memmapped on disk.

    Regenerates the IDENTICAL corpus chunks marco_device ingests (same
    key schedule: fold_in(chunk_i) over PRNGKey(seed)'s query half) and
    fetches each as fp16 — 27 GiB through the relay, one time, cached."""
    path = STORE.format(n=n, d=d, seed=seed)
    if os.path.exists(path):
        return np.load(path, mmap_mode="r")
    import functools

    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(seed)
    kc, kq = jax.random.split(key)
    centers = jax.random.normal(kc, (clusters, d), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("m",))
    def gen_chunk16(i, m: int):
        ki = jax.random.fold_in(kq, i)
        k1, k2 = jax.random.split(ki)
        cid = jax.random.randint(k1, (m,), 0, clusters)
        x = centers[cid] + jax.random.normal(k2, (m, d), jnp.float32)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        return x.astype(jnp.float16)

    out = np.lib.format.open_memmap(path + ".tmp", mode="w+",
                                    dtype=np.float16, shape=(n, d))
    t0 = time.time()
    nchunks = -(-n // chunk)
    for i in range(nchunks):
        m = min(chunk, n - i * chunk)
        out[i * chunk:i * chunk + m] = np.asarray(gen_chunk16(i, chunk))[:m]
        if (i + 1) % 16 == 0 or i == nchunks - 1:
            done = min((i + 1) * chunk, n)
            mb = done * d * 2 / 2**20
            print(f"  store {done}/{n} ({mb / (time.time() - t0):.0f} "
                  "MB/s fetch)", flush=True)
    out.flush()
    del out
    os.replace(path + ".tmp", path)
    print(f"fp16 host store cached: {path} "
          f"({n * d * 2 / 2**30:.1f} GiB in {time.time() - t0:.0f}s)",
          flush=True)
    return np.load(path, mmap_mode="r")


def host_rerank(store, cand_labels, xq, k: int, metric: str = "IP"):
    """Vectorised numpy refine: gather candidate rows from the fp16 host
    store, score fp32-exact, return (dist, labels) top-k best-first."""
    nq, kb = cand_labels.shape
    safe = np.clip(cand_labels, 0, None)
    xc = store[safe.reshape(-1)].astype(np.float32).reshape(nq, kb, -1)
    if metric == "IP":
        s = np.einsum("qd,qcd->qc", xq, xc, dtype=np.float32)
    else:
        diff = xc - xq[:, None, :]
        s = -np.einsum("qcd,qcd->qc", diff, diff, dtype=np.float32)
    s[cand_labels < 0] = -np.inf
    sel = np.argsort(-s, axis=1, kind="stable")[:, :k]
    lab = np.take_along_axis(cand_labels, sel, axis=1)
    dist = np.take_along_axis(s, sel, axis=1)
    if metric != "IP":
        dist = -dist
    return dist, np.where(np.isneginf(np.take_along_axis(s, sel, axis=1)),
                          -1, lab)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--storage", default="SQ6")
    ap.add_argument("--n", type=int, default=8_841_823)
    ap.add_argument("--d", type=int, default=1536)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--nprobes", default="16,64")
    ap.add_argument("--kfactors", default="4,8,16")
    args = ap.parse_args()

    import runpy

    sys.argv = ["marco_device.py", "--storage", args.storage,
                "--metric", "IP", "--unit-norm", "--assign-topk", "4",
                "--budget-gb", "13.5", "--n", str(args.n),
                "--nprobes", "16", "--batches", "48"]
    runpy.run_path("tools/marco_device.py", run_name="__main__")

    import duckdb_faiss_ext_tpu as dfx

    print("\n=== building fp16 host refine store ===", flush=True)
    store = build_host_store(args.n, args.d, args.seed)

    z = np.load(glob.glob("/root/repo/.marco_passA_*_un_ip2_h*.npz")[0])
    xq, gt = z["xq"].astype(np.float32), z["gt"]
    nq, k = xq.shape[0], 10
    xq_big = xq[np.arange(1024) % nq]

    print(f"\n=== refine tier ({args.storage} base + fp16 host rerank) ===",
          flush=True)
    print(f"{'nprobe':>7} {'k_factor':>9} {'recall@10':>10} "
          f"{'base r@10':>10} {'qps b1024':>10}", flush=True)
    for nprobe in [int(p) for p in args.nprobes.split(",")]:
        params = {"nprobe": str(nprobe)}
        base = dfx.faiss_search("marco", k, xq, params)
        base_rec = np.mean([len(set(a[a >= 0]) & set(b)) / k
                            for a, b in zip(base["label"], gt)])
        for kf in [int(f) for f in args.kfactors.split(",")]:
            kb = k * kf
            res = dfx.faiss_search("marco", kb, xq, params)
            dist, lab = host_rerank(store, res["label"].astype(np.int64),
                                    xq, k)
            rec = np.mean([len(set(a[a >= 0]) & set(b)) / k
                           for a, b in zip(lab, gt)])
            # throughput: device candidates + host rerank, b1024
            dfx.faiss_search("marco", kb, xq_big, params)   # warm shape
            t0 = time.time()
            r2 = dfx.faiss_search("marco", kb, xq_big, params)
            host_rerank(store, r2["label"].astype(np.int64),
                        xq[np.arange(1024) % nq], k)
            qps = 1024 / (time.time() - t0)
            print(f"{nprobe:>7} {kf:>9} {rec:10.4f} {base_rec:10.4f} "
                  f"{qps:10.1f}", flush=True)
    print("MARCO-REFINE COMPLETE", flush=True)


if __name__ == "__main__":
    main()
