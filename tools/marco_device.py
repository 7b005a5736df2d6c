"""Reference-corpus-scale serving measurement via device-resident ingest.

The reference's benchmark corpus is MS MARCO passage ada2: 8,841,823 docs
x 1536 dims (/root/reference/go/benches_c.go:31,
go/cmd/create_index/main.go:11) — 54 GB fp32.  tools/marco_scale.py (host
ingest path) moves that corpus through the tunneled host->device link
twice and never finished in a session; this tool uses the device-resident
ingest (models/ivf_device.py): the corpus is GENERATED on the chip
(seeded clustered mixture, same family as harness.datasets.synthetic_dataset),
assigned, SQ-encoded, and scattered into the padded Pallas list layout
without the fp32 rows ever existing off-device.

Ground truth is exact: a second regeneration pass brute-forces the 256
query rows against all N fp32 rows at HIGHEST precision (the corpus is
deterministic from the seed), so recall@10 below is true recall, not just
self-hit.

Reports (BASELINE.md rows): train time, device ingest rate, layout stats
(lmax / spill fraction), QPS at b48/b256/b1024 x nprobe sweep with
recall@10 + self-hit@1, and pipelined serving throughput.

Usage (real TPU, run under nohup; one TPU process at a time):
    env PYTHONPATH=/root/repo:/root/.axon_site python tools/marco_device.py \
        [--n 8841823] [--d 1536] [--nlist 4096] [--storage SQ4]
        [--budget-gb 13.5]
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8_841_823)
    ap.add_argument("--d", type=int, default=1536)
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--storage", default="SQ4")
    ap.add_argument("--nprobes", default="16,32,64,128")
    ap.add_argument("--batches", default="48,256,1024")
    ap.add_argument("--chunk", type=int, default=65536)
    ap.add_argument("--clusters", type=int, default=8192)
    ap.add_argument("--center-scale", type=float, default=1.0,
                    help="cluster-center spread; 1.0 keeps inter/intra "
                         "distance ratios realistic at high d (4.0 at "
                         "d=1536 makes clusters pathologically separable "
                         "and k-means collapses into mega-lists)")
    ap.add_argument("--balance", type=float, default=1.0,
                    help="kmeans_balance create param (skew-aware "
                         "assignment; 0 disables)")
    ap.add_argument("--assign-topk", type=int, default=0,
                    help="capped assignment: nearest of top-T candidate "
                         "lists with free capacity (0 = plain nearest; "
                         "rows fitting nowhere stay exact in the spill)")
    ap.add_argument("--metric", default="L2", choices=["L2", "IP"],
                    help="index metric (the reference's MARCO index is "
                         "'ip': go/benches_c.go:92)")
    ap.add_argument("--unit-norm", action="store_true",
                    help="L2-normalize corpus + query rows (ada2 "
                         "embeddings are unit-norm; also moderates "
                         "k-means skew vs the raw clustered mixture)")
    ap.add_argument("--train-rows", type=int, default=262_144)
    ap.add_argument("--budget-gb", type=float, default=13.5,
                    help="HBM cap for the padded list payload")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--skip-gt", action="store_true",
                    help="skip the exact ground-truth pass (self-hit only)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import duckdb_faiss_ext_tpu as dfx
    from duckdb_faiss_ext_tpu.catalog import GLOBAL_CATALOG
    from duckdb_faiss_ext_tpu.ops.pallas_ivf import choose_lmax

    dfx.set_precision("fast")

    n, d, chunk = args.n, args.d, args.chunk
    nchunks = -(-n // chunk)
    key = jax.random.PRNGKey(args.seed)
    kc, kq = jax.random.split(key)
    centers = args.center_scale * jax.random.normal(
        kc, (args.clusters, d), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("m",))
    def gen_chunk(i, m: int):
        """Deterministic clustered chunk i: centers[cid] + N(0, 1)."""
        ki = jax.random.fold_in(kq, i)
        k1, k2 = jax.random.split(ki)
        cid = jax.random.randint(k1, (m,), 0, args.clusters)
        x = centers[cid] + jax.random.normal(k2, (m, d), jnp.float32)
        if args.unit_norm:
            x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        return x

    def chunk_rows(i):
        # All chunks padded to `chunk` rows (one jit shape); the final
        # partial chunk is generated full and sliced on use.
        return min(chunk, n - i * chunk)

    name = "marco"
    desc = f"IVF{args.nlist},{args.storage}"
    print(f"corpus {n}x{d} clustered({args.clusters}, scale "
          f"{args.center_scale}{', unit-norm' if args.unit_norm else ''}), "
          f"index {desc} {args.metric}, device-resident, "
          f"balance {args.balance}, assign_topk {args.assign_topk}",
          flush=True)
    dfx.faiss_create_params(name, d, desc,
                            {"kmeans_balance": str(args.balance),
                             "assign_topk": str(args.assign_topk)},
                            metric_type=("INNER_PRODUCT"
                                         if args.metric == "IP" else "L2"))

    # ---- train on device-generated rows ---------------------------------
    # FROZEN BENCHMARK INDEX (VERDICT r3 #5): k-means under the tunneled
    # relay converges to DIFFERENT local optima across sessions (same
    # seeds, different XLA env → spill 525k vs 1.05M rows), so the
    # trained centroids + SQ stats are persisted keyed by every training
    # input.  Every session then serves the IDENTICAL index — the
    # analogue of the reference benchmarking one saved index file
    # (/root/reference/go/benches_c.go:57 FAISS_LOAD).
    import os

    from duckdb_faiss_ext_tpu.ops.sq import SQ_LEVELS

    entry = GLOBAL_CATALOG.get(name)
    idx = entry.index
    # Storage-independent key: k-means ignores the codec, and the SQ
    # stats are stored as (vmin, span) so every SQ level derives its own
    # scale = span/levels from the same frozen training pass.
    cent_cache = (f"/root/repo/.marco_cents_d{d}_s{args.seed}"
                  f"_c{args.clusters}_t{args.train_rows}_l{args.nlist}"
                  f"_cs{args.center_scale}_b{args.balance}"
                  f"_{args.metric}{'_un' if args.unit_norm else ''}.npz")
    sq = idx.sq_type if idx.sq_type not in (None, "fp16", "bf16") else None
    if os.path.exists(cent_cache):
        z = np.load(cent_cache)
        idx._centroids = np.asarray(z["centroids"], np.float32)
        if sq is not None:
            if "sq_vmin" not in z.files:
                # cache written by a non-SQ run: derive the stats from
                # the (deterministic) training subsample, then extend it
                from duckdb_faiss_ext_tpu.ops.sq import sq_train

                tchunks = -(-args.train_rows // chunk)
                xt = jnp.concatenate(
                    [gen_chunk(i, chunk) for i in range(tchunks)],
                    axis=0)[: args.train_rows]
                vmin, scale1 = sq_train(xt, 1)
                del xt
                np.savez(cent_cache, centroids=z["centroids"],
                         sq_vmin=np.asarray(vmin),
                         sq_span=np.asarray(scale1))
                z = np.load(cent_cache)
            idx._sq_vmin = np.asarray(z["sq_vmin"], np.float32)
            idx._sq_scale = (np.asarray(z["sq_span"], np.float32)
                             / float(SQ_LEVELS[sq]))
        idx._populate_quantizer()
        idx._invalidate()
        entry.needs_training = False
        print(f"frozen index loaded from {cent_cache}", flush=True)
    else:
        t0 = time.time()
        tchunks = -(-args.train_rows // chunk)
        xt = jnp.concatenate([gen_chunk(i, chunk) for i in range(tchunks)],
                             axis=0)[: args.train_rows]
        dfx.faiss_train_device(xt, name)
        del xt
        print(f"train ({args.train_rows} rows, {args.nlist} lists): "
              f"{time.time() - t0:.1f}s", flush=True)
        extra = {}
        if sq is not None and getattr(idx, "_sq_vmin", None) is not None:
            extra = {"sq_vmin": np.asarray(idx._sq_vmin),
                     "sq_span": (np.asarray(idx._sq_scale)
                                 * float(SQ_LEVELS[sq]))}
        np.savez(cent_cache, centroids=np.asarray(idx._centroids), **extra)
        print(f"trained index frozen to {cent_cache}", flush=True)
    cents = jnp.asarray(idx._centroids)

    # ---- pass A: exact counts (lmax sizing) + queries + exact GT --------
    from duckdb_faiss_ext_tpu.models.ivf_device import _assign_chunk

    nq, k = 256, 10

    @jax.jit
    def gt_merge(xq, xc, base_row, best_d, best_l):
        xy = jnp.dot(xq, xc.T, precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
        if args.metric == "IP":
            dist = -xy                       # min-oriented carry
        else:
            xn = jnp.sum(xq * xq, 1, keepdims=True)
            cn = jnp.sum(xc * xc, 1)[None, :]
            dist = xn - 2.0 * xy + cn
        rows = base_row + jax.lax.broadcasted_iota(
            jnp.int32, (1, xc.shape[0]), 1)
        cat_d = jnp.concatenate([best_d, dist], axis=1)
        cat_l = jnp.concatenate(
            [best_l, jnp.broadcast_to(rows, dist.shape)], axis=1)
        nd, sel = jax.lax.top_k(-cat_d, k)
        return -nd, jnp.take_along_axis(cat_l, sel, axis=1)

    import hashlib
    import os

    # _ip2: IP coarse training went spherical (cached counts depend on
    # the centroids; gt does not, but one cache carries both).  The
    # centroid digest ties the counts to the FROZEN index above — a
    # retrain (new digest) invalidates stale counts automatically.
    cdig = hashlib.sha1(
        np.ascontiguousarray(idx._centroids)).hexdigest()[:8]
    tag = (("_un" if args.unit_norm else "")
           + ("_ip2" if args.metric == "IP" else "")
           + f"_h{cdig}")
    cache = (f"/root/repo/.marco_passA_n{n}_d{d}_s{args.seed}"
             f"_c{args.clusters}_t{args.train_rows}_l{args.nlist}"
             f"_cs{args.center_scale}_b{args.balance}{tag}.npz")
    if os.path.exists(cache) and (
            args.skip_gt or "gt" in np.load(cache).files):
        z = np.load(cache)
        counts, xq = z["counts"], z["xq"]
        gt = z["gt"] if "gt" in z.files else None
        print(f"pass A loaded from {cache}", flush=True)
    else:
        # (a cache written by a --skip-gt run has counts but no GT —
        # redo the pass when this run needs recall numbers)
        t0 = time.time()
        counts = np.zeros((args.nlist,), np.int64)
        best_d = jnp.full((nq, k), np.inf, jnp.float32)
        best_l = jnp.full((nq, k), -1, jnp.int32)
        xq_dev = None
        for i in range(nchunks):
            m = chunk_rows(i)
            x = gen_chunk(i, chunk)[:m]
            if i == 0:
                xq_dev = x[:nq]
                xq = np.asarray(xq_dev)
            a = np.asarray(_assign_chunk(
                x, cents, jnp.float32(idx.metric_arg),
                metric=idx.metric.name,
                sim=idx.metric.name == "INNER_PRODUCT"))
            counts += np.bincount(a, minlength=args.nlist)
            if not args.skip_gt:
                best_d, best_l = gt_merge(xq_dev, x, jnp.int32(i * chunk),
                                          best_d, best_l)
            if (i + 1) % 16 == 0 or i == nchunks - 1:
                print(f"  pass A {i + 1}/{nchunks} "
                      f"({(i + 1) * chunk / (time.time() - t0):.0f} rows/s)",
                      flush=True)
        gt = np.asarray(best_l) if not args.skip_gt else None
        extra = {} if gt is None else {"gt": gt}
        np.savez(cache, counts=counts, xq=xq, **extra)
        print(f"pass A (counts+GT): {time.time() - t0:.1f}s (cached to "
              f"{cache})", flush=True)
    cmax = int(counts.max())
    print(f"list counts avg {counts.mean():.0f} max {cmax}", flush=True)

    # lmax: full padding if it fits the budget, else capped (spill holds
    # the overflow).
    from duckdb_faiss_ext_tpu.ops.sq import sq_code_width

    w = (sq_code_width(d, args.storage.lower())
         if args.storage.upper().startswith("SQ") else d * 4)
    # Largest 512-multiple lmax whose padded payload PLUS the spill
    # buffer's pow2 capacity fit the budget together (the spill buffer
    # grows by doubling, so budget its capacity, not its row count).
    budget = int(args.budget_gb * (1 << 30))

    def spill_pred(lmax_try: int) -> int:
        displaced = int(np.maximum(counts - lmax_try, 0).sum())
        if args.assign_topk > 1:
            # Capped assignment re-homes displaced rows into free slots of
            # their top-T candidates, but locality limits how much free
            # capacity is reachable (measured on the 30x-skew synthetic
            # corpus: far less than all of it).  Budget for absorbing at
            # most half the free capacity — over-predicting spill only
            # pre-allocates a larger buffer, under-predicting doubles the
            # buffer mid-ingest and OOMs next to a near-HBM payload.
            free = args.nlist * lmax_try - (n - displaced)
            return max(0, displaced - max(0, free) // 2) + n // 100
        return displaced

    lmax = max(512, min(choose_lmax(cmax),
                        (budget // (args.nlist * w) // 512) * 512))
    if args.assign_topk > 1:
        # Capacity-filled layout: every probe scores lmax slots, so lmax
        # past ~n/nlist is pure scan waste.  15% headroom keeps greedy
        # displacement (and its recall cost) rare.
        need = -(-int(n * 1.15) // (args.nlist * 512)) * 512
        lmax = min(lmax, max(512, need))
    while lmax > 512:
        if args.nlist * lmax * w + (spill_pred(lmax) + chunk) * w <= budget:
            break
        lmax -= 512
    nspill = spill_pred(lmax)
    spill_cap = nspill + chunk          # chunk-local pow2 append headroom
    print(f"layout: lmax {lmax}, payload "
          f"{args.nlist * lmax * w / 2**30:.2f} GiB, spill {nspill} rows "
          f"({100 * nspill / n:.2f}%)", flush=True)

    # ---- pass B: device-resident ingest ----------------------------------
    t0 = time.time()
    for i in range(nchunks):
        m = chunk_rows(i)
        x = gen_chunk(i, chunk)[:m]
        dfx.faiss_add_device(x, name, lmax=lmax, spill_capacity=spill_cap)
        if (i + 1) % 16 == 0 or i == nchunks - 1:
            el = time.time() - t0
            done = min((i + 1) * chunk, n)
            print(f"  ingested {done}/{n} ({done / el:.0f} vec/s)",
                  flush=True)
    t_add = time.time() - t0
    print(f"device ingest: {t_add:.1f}s ({n / t_add:.0f} vectors/s); "
          f"spill_n {idx._dr.spill_n}", flush=True)

    # ---- serving sweep ----------------------------------------------------
    batches = [int(b) for b in args.batches.split(",")]
    nprobes = [int(p) for p in args.nprobes.split(",")]
    for nprobe in nprobes:
        params = {"nprobe": str(nprobe)}
        t0 = time.time()
        res = dfx.faiss_search(name, k, xq, params)   # compile + warm
        print(f"first search nprobe={nprobe}: {time.time() - t0:.1f}s",
              flush=True)
        self_hit = float((res["label"][:, 0] == np.arange(nq)).mean())
        path = getattr(idx, "_last_scan_path", None)
        if path:
            print(f"  scan path: {path}", flush=True)
        if gt is not None:
            rec = np.mean([len(set(a[a >= 0]) & set(b)) / k
                           for a, b in zip(res["label"], gt)])
        else:
            rec = float("nan")
        for b in batches:
            try:
                q = xq[np.arange(b) % nq]
                dfx.faiss_search(name, k, q, params)  # warm this shape
                reps = 3
                t0 = time.time()
                for _ in range(reps):
                    dfx.faiss_search(name, k, q, params)
                qps = reps * b / (time.time() - t0)
                print(f"qps b{b} nprobe={nprobe}: {qps:.1f}  "
                      f"(recall@10 {rec:.3f}, self-hit@1 {self_hit:.3f})",
                      flush=True)
            except Exception as e:                    # one OOM shape must
                print(f"qps b{b} nprobe={nprobe}: FAILED "
                      f"{type(e).__name__}", flush=True)  # not kill the run
        # pipelined serving (single-fetch batched tier)
        qbig = xq[np.arange(2048) % nq]
        dfx.faiss_search_batched(name, k, qbig, params, batch_size=256)
        t0 = time.time()
        dfx.faiss_search_batched(name, k, qbig, params, batch_size=256)
        qps = 2048 / (time.time() - t0)
        print(f"pipelined 8xb256 nprobe={nprobe}: {qps:.1f} qps", flush=True)

    print("MARCO-DEVICE RUN COMPLETE", flush=True)


if __name__ == "__main__":
    main()
