"""Reference-corpus-scale single-chip serving measurement.

The reference's benchmark corpus is MS MARCO passage ada2: 8,841,823 docs
x 1536 dims (go/benches_c.go:31, go/cmd/create_index/main.go:11) — 54 GB
fp32, which does NOT fit a single v5e chip (16 GB HBM).  The reference
serves it from host RAM via HNSW; the TPU-native answer is compressed
storage: IVF4096,SQ8 holds the corpus as 13.6 GB of uint8 codes on one
chip, decoded in-kernel into the MXU distance tiles.

Synthetic stand-in (no egress): gaussian vectors at the exact corpus
shape, streamed in chunks so the host never materializes the raw 54 GB.
Reports: train time, ingest rate (vectors/s), search QPS at b48/b256
nprobe=64, and self-recall@10 (each query vector is a stored corpus row —
finding its own row tests the quantization+probe pipeline end to end).

Usage (real TPU, long-running — run under tmux/nohup):
    env PYTHONPATH=/root/repo:/root/.axon_site python tools/marco_scale.py \
        [--n 8841823] [--d 1536] [--nlist 4096] [--storage SQ8]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8_841_823)
    ap.add_argument("--d", type=int, default=1536)
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--storage", default="SQ8")
    ap.add_argument("--nprobe", type=int, default=64)
    ap.add_argument("--train-rows", type=int, default=262_144)
    ap.add_argument("--chunk", type=int, default=131_072)
    args = ap.parse_args()

    import duckdb_faiss_ext_tpu as dfx

    # Throughput mode: bf16 coarse assignment + the int8-native SQ8 scan
    # (codes stay int8 in the dot; exact decode-rerank of the top-k).
    dfx.set_precision("fast")

    name = "marco"
    desc = f"IVF{args.nlist},{args.storage}"
    print(f"corpus {args.n}x{args.d}, index {desc}, nprobe={args.nprobe}",
          flush=True)
    dfx.faiss_create(name, args.d, desc, metric_type="L2")

    rng = np.random.default_rng(0)
    t0 = time.time()
    xt = rng.standard_normal((args.train_rows, args.d)).astype(np.float32)
    dfx.faiss_manual_train(xt, name)
    t_train = time.time() - t0
    print(f"train ({args.train_rows} rows, {args.nlist} lists): "
          f"{t_train:.1f}s", flush=True)

    # Streamed ingest: chunk generation + add, raw data discarded per chunk.
    # Queries are corpus rows saved from the first chunk (self-recall probe).
    t0 = time.time()
    added = 0
    queries = None
    while added < args.n:
        m = min(args.chunk, args.n - added)
        x = rng.standard_normal((m, args.d)).astype(np.float32)
        if queries is None:
            queries = x[:256].copy()
        dfx.faiss_add(x, name)
        added += m
        if added % (args.chunk * 8) == 0 or added == args.n:
            el = time.time() - t0
            print(f"  added {added}/{args.n} ({added/el:.0f} vec/s)",
                  flush=True)
    t_add = time.time() - t0
    print(f"ingest: {t_add:.1f}s ({args.n / t_add:.0f} vectors/s)",
          flush=True)

    params = {"nprobe": str(args.nprobe)}
    # Warm the jit caches / device layout.
    t0 = time.time()
    dfx.faiss_search(name, 10, queries[:48], params)
    print(f"first search (layout build + compile): {time.time()-t0:.1f}s",
          flush=True)

    for batch in (48, 256):
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            res = dfx.faiss_search(name, 10, queries[:batch], params)
        qps = reps * batch / (time.time() - t0)
        print(f"qps b{batch} nprobe={args.nprobe}: {qps:.1f}", flush=True)

    if args.storage.upper().startswith("SQ"):
        # A/B the int8-native scan against the decode path at b256.
        dfx.set_sq_dot("decode")
        try:
            dfx.faiss_search(name, 10, queries[:256], params)  # compile
            t0 = time.time()
            for _ in range(3):
                dfx.faiss_search(name, 10, queries[:256], params)
            qps_dec = 3 * 256 / (time.time() - t0)
            print(f"qps b256 decode-path (vs int8 above): {qps_dec:.1f}",
                  flush=True)
        finally:
            dfx.set_sq_dot("auto")

    # Self-recall@10: query row i of the corpus is stored at a known label
    # (add order), so its own id must appear in its top-10.
    res = dfx.faiss_search(name, 10, queries, params)
    expect = np.arange(queries.shape[0])
    hits = (res["label"] == expect[:, None]).any(axis=1)
    print(f"self-recall@10 over {queries.shape[0]} corpus queries: "
          f"{hits.mean():.3f}", flush=True)
    print("MARCO-SCALE RUN COMPLETE", flush=True)


if __name__ == "__main__":
    main()
