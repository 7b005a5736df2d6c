"""The reference's headline index family at its own benchmark scale:
graph-walk (HNSW128-equivalent) serving over 8,841,823 x 1536.

The reference benchmarks `IDMap,HNSW128,Flat` over MS MARCO ada2
(/root/reference/go/cmd/create_index/main.go:29, Makefile:93).  54 GB of
fp32 rows cannot exist on a 16 GB v5e, so everything here is coded:

  phase 1  train two 181-way half-space k-means (product cells: 181^2 =
           32761 build clusters for ~cheap training — the IMI trick);
  phase 2  generate the corpus on-device (same seeded unit-norm
           clustered mixture as tools/marco_device.py, so the cached
           exact GT from the IVF runs applies verbatim), SQ4-encode into
           a 6.8 GiB build buffer, assign top-2 product cells;
  phase 3  coded clustered kNN scan (ops/graph.py::_clustered_knn_scan,
           codec=sq4) at intermediate degree, + one coded NN-descent
           round; final adjacency = best `deg` forward edges (the
           forward-first rule: reverse edges only backfill, measured
           +7.5pp uniform — and a kNN build leaves nothing to backfill);
  phase 4  free the sq4 buffer, re-encode the corpus as SQ8 (13.6 GiB)
           — the serving walk decodes SQ8 rows in-place (walk_scan
           codec path) and fp32-reranks the pool against them;
  phase 5  ef (pool) sweep at b48 / b1024 vs the cached exact fp32 GT.

Usage (real TPU, ~45-60 min):
  env PYTHONPATH=/root/repo:/root/.axon_site python tools/marco_graph.py \
      [--n 8841823] [--deg 32] [--inter 48] [--refine-rounds 1]
"""

from __future__ import annotations

import argparse
import functools
import os
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8_841_823)
    ap.add_argument("--d", type=int, default=1536)
    ap.add_argument("--chunk", type=int, default=65536)
    ap.add_argument("--clusters", type=int, default=8192)
    ap.add_argument("--deg", type=int, default=32)
    ap.add_argument("--inter", type=int, default=48,
                    help="build/carry degree (HBM: 8 bytes/row/entry; "
                         "64 -> 4.5 GiB carry next to the 6.8 GiB sq4 "
                         "buffer)")
    ap.add_argument("--lmax-factor", type=float, default=1.5,
                    help="membership-table capacity factor (1.5 covered "
                         "0.753 of entries at 8.8M; 3.0 -> >=0.95 at 4x "
                         "phase-3 cost)")
    ap.add_argument("--half-k", type=int, default=181)
    # default 0: one descent round at 8.8M gathers ~2.1G scattered rows
    # (~0.5-1 TB of code bytes) — land the clustered-scan build first,
    # opt into refinement when the serving numbers justify it.
    ap.add_argument("--refine-rounds", type=int, default=0)
    ap.add_argument("--descent-rows", type=int, default=65536,
                    help="rows per descent dispatch: 524288 made one "
                         "dispatch a multi-minute XLA program and the "
                         "TPU worker watchdog killed it (2026-08-21); "
                         "65536 keeps each ~20-45 s")
    ap.add_argument("--serve-codec", default="sq8",
                    choices=["sq8", "sq6"],
                    help="phase-4 serving code buffer: sq8 (13.6 GiB at "
                         "8.8M x 1536) or sq6 (10.2 GiB — frees ~3.4 GiB "
                         "of HBM for a deg-64 adjacency, the identified "
                         "recall cap of the deg-32 builds)")
    ap.add_argument("--pools", default="16,32,64,128")
    ap.add_argument("--width", type=int, default=4)
    ap.add_argument("--batches", default="48,512,1024")
    ap.add_argument("--train-rows", type=int, default=131_072)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from duckdb_faiss_ext_tpu.ops.flat_search import finalize_scores
    from duckdb_faiss_ext_tpu.ops.graph import (clustered_knn_scan_chunked,
                                                graph_search,
                                                membership_table,
                                                nn_descent_round_chunked)
    from duckdb_faiss_ext_tpu.ops.kmeans import kmeans_fit
    from duckdb_faiss_ext_tpu.ops.sq import SQ_LEVELS, sq_train

    n, d, chunk = args.n, args.d, args.chunk
    nchunks = -(-n // chunk)
    n_pad = chunk * nchunks
    key = jax.random.PRNGKey(args.seed)
    kc, kq = jax.random.split(key)
    centers = jax.random.normal(kc, (args.clusters, d), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("m",))
    def gen_chunk(i, m: int):
        """Identical generator to tools/marco_device.py --unit-norm: the
        cached exact GT (.marco_passA_*_un_ip2.npz) applies verbatim."""
        ki = jax.random.fold_in(kq, i)
        k1, k2 = jax.random.split(ki)
        cid = jax.random.randint(k1, (m,), 0, args.clusters)
        x = centers[cid] + jax.random.normal(k2, (m, d), jnp.float32)
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    cache = (f"/root/repo/.marco_passA_n{n}_d{d}_s{args.seed}"
             f"_c{args.clusters}_t262144_l4096_cs1.0_b1.0_un_ip2.npz")
    # The cache is SHARED with tools/marco_device.py, which also stores
    # the IVF list counts there; a --skip-gt device run leaves counts+xq
    # but no gt.  Merge-preserve whatever is present (clobbering counts
    # would corrupt the next device run's layout sizing).
    cached = dict(np.load(cache).items()) if os.path.exists(cache) else {}
    if "gt" in cached:
        xq_np, gt = cached["xq"], cached["gt"]
    else:
        # Exact fp32 GT pass (marco_device convention: queries are the
        # first 256 rows of chunk 0); cached for reuse.
        nq0, k0 = 256, 10
        xq_dev = gen_chunk(0, chunk)[:nq0]
        best_d = jnp.full((nq0, k0), -np.inf, jnp.float32)
        best_l = jnp.full((nq0, k0), -1, jnp.int32)

        @jax.jit
        def gt_merge(xc, base, bd, bl):
            xy = jnp.einsum("qd,cd->qc", xq_dev, xc,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
            rows = base + jax.lax.broadcasted_iota(
                jnp.int32, (1, xc.shape[0]), 1)
            cat_d = jnp.concatenate([bd, xy], axis=1)
            cat_l = jnp.concatenate(
                [bl, jnp.broadcast_to(rows, xy.shape)], axis=1)
            nd, sel = jax.lax.top_k(cat_d, k0)
            return nd, jnp.take_along_axis(cat_l, sel, axis=1)

        t0 = time.time()
        for i in range(nchunks):
            m = min(chunk, n - i * chunk)
            best_d, best_l = gt_merge(gen_chunk(i, chunk)[:m],
                                      jnp.int32(i * chunk), best_d, best_l)
        xq_np, gt = np.asarray(xq_dev), np.asarray(best_l)
        cached.update(xq=xq_np, gt=gt)
        np.savez(cache, **cached)
        print(f"GT pass: {time.time()-t0:.1f}s (cached {cache})",
              flush=True)
    nq_gt, k = gt.shape
    print(f"corpus {n}x{d} unit-norm IP; GT cache {nq_gt} queries",
          flush=True)

    # ---- phase 1: half-space product clustering for the build ----------
    t0 = time.time()
    hk, dh = args.half_k, d // 2
    xt = jnp.concatenate(
        [gen_chunk(i, chunk) for i in range(-(-args.train_rows // chunk))],
        axis=0)[: args.train_rows]
    c1, _ = kmeans_fit(xt[:, :dh], hk, seed=1)
    c2, _ = kmeans_fit(xt[:, dh:], hk, seed=2)
    del xt
    nlist = hk * hk
    print(f"phase1 train 2x{hk}-way half k-means: {time.time()-t0:.1f}s",
          flush=True)

    # ---- phase 2: SQ4 build buffer + top-2 product-cell assignment -----
    # SQ ranges from a training slice (unit-norm rows are ~N(0, 1/sqrt d)
    # per dim; a 131k sample pins the range like ivf_device's sq_train).
    t0 = time.time()
    xs = gen_chunk(0, chunk)
    vmin4, scale4 = sq_train(xs, SQ_LEVELS["sq4"])
    vmin8, scale8 = sq_train(xs, SQ_LEVELS["sq8"])
    del xs

    @jax.jit
    def encode_sq4(x):
        q = jnp.clip(jnp.round((x - vmin4[None, :]) / scale4[None, :]),
                     0, SQ_LEVELS["sq4"]).astype(jnp.uint8)
        return q[:, 0::2] | (q[:, 1::2] << 4)

    @jax.jit
    def encode_sq8(x):
        return jnp.clip(jnp.round((x - vmin8[None, :]) / scale8[None, :]),
                        0, SQ_LEVELS["sq8"]).astype(jnp.uint8)

    vmin6, scale6 = sq_train(gen_chunk(0, chunk), SQ_LEVELS["sq6"])

    @jax.jit
    def encode_sq6(x):
        """Row-major SQ6 packing (m, 3*d/4), byte w = group*3 + plane —
        the layout ops/sq.py::sq6_decode reads.  The three planes are
        interleaved with interior-dilated pads (stride-3 writes as pure
        VPU ops): stacking along a minor size-3 axis would make TPU
        tiling pad it 42x (the ivf_device._encode_chunk lesson)."""
        q = jnp.clip(jnp.round((x - vmin6[None, :]) / scale6[None, :]),
                     0, SQ_LEVELS["sq6"]).astype(jnp.uint8)
        m = x.shape[0]
        g = q.reshape(m, -1, 4).astype(jnp.uint16)
        b0 = ((g[..., 0] << 2) | (g[..., 1] >> 4)).astype(jnp.uint8)
        b1 = (((g[..., 1] & 15) << 4) | (g[..., 2] >> 2)).astype(jnp.uint8)
        b2 = (((g[..., 2] & 3) << 6) | g[..., 3]).astype(jnp.uint8)

        def dil3(b, off):
            return jax.lax.pad(b, jnp.uint8(0),
                               ((0, 0, 0), (off, 2 - off, 2)))
        return dil3(b0, 0) | dil3(b1, 1) | dil3(b2, 2)

    @jax.jit
    def top2_cells(x):
        # Exact top-2 product cells from per-half top-2 (the candidates
        # (i1,j1),(i1,j2),(i2,j1),(i2,j2) provably contain the true
        # top-2 of d1_i + d2_j).
        def half_top2(xh, c):
            xy = jnp.einsum("nd,kd->nk", xh, c,
                            preferred_element_type=jnp.float32)
            dist = (jnp.sum(xh * xh, 1, keepdims=True) - 2.0 * xy
                    + jnp.sum(c * c, 1)[None, :])
            v, i = jax.lax.top_k(-dist, 2)
            return -v, i
        d1, i1 = half_top2(x[:, :dh], c1)
        d2, i2 = half_top2(x[:, dh:], c2)
        cand_d = jnp.stack([d1[:, 0] + d2[:, 0], d1[:, 0] + d2[:, 1],
                            d1[:, 1] + d2[:, 0], d1[:, 1] + d2[:, 1]], 1)
        cand_i = jnp.stack([i1[:, 0] * hk + i2[:, 0],
                            i1[:, 0] * hk + i2[:, 1],
                            i1[:, 1] * hk + i2[:, 0],
                            i1[:, 1] * hk + i2[:, 1]], 1)
        _, sel = jax.lax.top_k(-cand_d, 2)
        return jnp.take_along_axis(cand_i, sel, axis=1).astype(jnp.int32)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def put_rows(buf, rows, i):
        return jax.lax.dynamic_update_slice(buf, rows, (i * chunk, 0))

    codes4 = jnp.zeros((n_pad, (d + 1) // 2), jnp.uint8)
    a12 = np.empty((n, 2), np.int32)
    for i in range(nchunks):
        m = min(chunk, n - i * chunk)
        x = gen_chunk(i, chunk)
        codes4 = put_rows(codes4, encode_sq4(x), jnp.int32(i))
        a12[i * chunk:i * chunk + m] = np.asarray(top2_cells(x))[:m]
        if (i + 1) % 32 == 0 or i == nchunks - 1:
            print(f"  phase2 {i+1}/{nchunks} "
                  f"({(i+1)*chunk/(time.time()-t0):.0f} rows/s)",
                  flush=True)
    print(f"phase2 sq4 encode + assign: {time.time()-t0:.1f}s", flush=True)

    # ---- phase 3: coded clustered kNN + NN-descent ----------------------
    t0 = time.time()
    table, lmax = membership_table(a12, nlist, args.inter,
                                   lmax_factor=args.lmax_factor)
    occ = (table >= 0).sum()
    print(f"  build cells {nlist}, lmax {lmax}, table coverage "
          f"{occ / (2 * n):.3f} of 2n entries", flush=True)
    def prog(done, total):
        if done % 8192 == 0 or done == total:
            print(f"  phase3 scan {done}/{total} "
                  f"({done / max(time.time() - t0, 1e-9):.0f} cells/s)",
                  flush=True)

    # Host-chunked: one fori over all 32,761 cells was a single ~30-min
    # XLA dispatch — the round-3 TPU-worker crash.
    # RESUMABLE BUILD (round-5): the relay dies in ~15-30 min windows,
    # shorter than the full build — each completed phase-3 stage
    # (clustered scan, then every descent round) is checkpointed to host
    # disk keyed by its inputs, so a retry resumes instead of restarting.
    knn_key = (f"/root/repo/.marco_graph_knn_n{n}_s{args.seed}"
               f"_i{args.inter}_hk{args.half_k}_lf{args.lmax_factor}")

    def knn_ckpt(stage: int) -> str:
        return f"{knn_key}_r{stage}.npy"

    done_rounds = -1
    for r in range(args.refine_rounds, -1, -1):
        if os.path.exists(knn_ckpt(r)):
            done_rounds = r
            break
    if done_rounds >= 0:
        knn = jnp.asarray(np.load(knn_ckpt(done_rounds)))
        print(f"phase3 resume: loaded {knn_ckpt(done_rounds)}",
              flush=True)
    else:
        knn = clustered_knn_scan_chunked(
            codes4, jnp.asarray(table), jnp.float32(0.0),
            degree=args.inter, lmax=int(lmax), nlist=int(nlist),
            metric="INNER_PRODUCT", precision=jax.lax.Precision.DEFAULT,
            codec="sq4", vmin=vmin4, scale=scale4, cells_per_call=2048,
            progress=prog)
        np.save(knn_ckpt(0) + ".tmp.npy", np.asarray(knn))
        os.replace(knn_ckpt(0) + ".tmp.npy", knn_ckpt(0))
        done_rounds = 0
        print(f"phase3 clustered scan: {time.time()-t0:.1f}s "
              f"(checkpointed)", flush=True)
    t0 = time.time()
    for r in range(done_rounds, args.refine_rounds):
        # Row-block-resumable descent round: _nn_descent_rows writes only
        # its row range (reads the constant previous-round graph), so
        # completed blocks land in a host memmap with a progress sidecar
        # — a relay death mid-round costs one block, not the round.
        from duckdb_faiss_ext_tpu.ops.graph import _nn_descent_rows

        part = knn_ckpt(r + 1) + ".part.npy"
        prog_f = part + ".rows"
        rows_done = (int(open(prog_f).read())
                     if os.path.exists(prog_f) else 0)
        if os.path.exists(part) and rows_done > 0:
            nxt = np.lib.format.open_memmap(part, mode="r+")
            print(f"  descent r{r} resuming at {rows_done}/{n_pad}",
                  flush=True)
        else:
            nxt = np.lib.format.open_memmap(
                part, mode="w+", dtype=np.int32,
                shape=(n_pad, args.inter))
            rows_done = 0
        rpc = max(16, args.descent_rows // 16 * 16)
        while rows_done < n_pad:
            nr = min(rpc, n_pad - rows_done)
            while nr % 16:
                nr -= 1
            blk = _nn_descent_rows(
                codes4, knn, jnp.float32(0.0), jnp.int32(rows_done),
                nrows=nr, sample=4, q_block=16, metric="INNER_PRODUCT",
                precision=jax.lax.Precision.DEFAULT,
                codec="sq4", vmin=vmin4, scale=scale4)
            nxt[rows_done:rows_done + nr] = np.asarray(blk)
            rows_done += nr
            with open(prog_f + ".tmp", "w") as f:
                f.write(str(rows_done))
            os.replace(prog_f + ".tmp", prog_f)
            print(f"  descent r{r} {rows_done}/{n_pad} "
                  f"({rows_done / max(time.time()-t0, 1e-9):.0f} rows/s)",
                  flush=True)
        knn = jnp.asarray(np.asarray(nxt))
        np.save(knn_ckpt(r + 1) + ".tmp.npy", np.asarray(nxt))
        os.replace(knn_ckpt(r + 1) + ".tmp.npy", knn_ckpt(r + 1))
        del nxt
        os.remove(part)
        os.remove(prog_f)
        print(f"  descent r{r} checkpointed", flush=True)
    adj = jax.jit(lambda a: a[:, :args.deg])(knn)   # forward-first degree
    np.asarray(adj[:1])
    del knn
    # Lane-fold the adjacency to 128 lanes: an (N, deg<128) int32 gather
    # operand makes XLA materialise a lane-pad copy of the whole table
    # (+2.1 GiB at deg 64 — the 146.8 MB-over walk compile OOM,
    # 2026-08-21).  Chunked so the fold itself allocates only small
    # temps next to the build buffer.
    fold_f = max(1, 128 // args.deg) if 128 % args.deg == 0 else 1
    if fold_f > 1:
        @functools.partial(jax.jit, donate_argnums=(0,),
                           static_argnames=("rows",))
        def fold_put(buf, a, j, rows: int):
            blk = jax.lax.dynamic_slice(
                a, (j * rows, 0), (rows, args.deg))
            return jax.lax.dynamic_update_slice(
                buf, blk.reshape(rows // fold_f, fold_f * args.deg),
                (j * rows // fold_f, 0))

        adj_f = jnp.zeros((n_pad // fold_f, fold_f * args.deg), jnp.int32)
        rows = chunk
        for j in range(n_pad // rows):
            adj_f = fold_put(adj_f, adj, jnp.int32(j), rows=rows)
        np.asarray(adj_f[:1, :1])
        del adj
        adj = adj_f
    del codes4
    print(f"phase3 nn-descent x{args.refine_rounds} + slice+fold: "
          f"{time.time()-t0:.1f}s", flush=True)

    # ---- phase 4: SQ serving buffer (sq8, or sq6 for deg>=64) -----------
    t0 = time.time()
    s_codec = args.serve_codec
    enc = encode_sq8 if s_codec == "sq8" else encode_sq6
    s_vmin, s_scale = ((vmin8, scale8) if s_codec == "sq8"
                       else (vmin6, scale6))
    gen_s = jax.jit(lambda i: enc(gen_chunk(i, chunk)))
    s_w = d if s_codec == "sq8" else 3 * (d // 4)
    codes_s = jnp.zeros((n_pad, s_w), jnp.uint8)
    for i in range(nchunks):
        codes_s = put_rows(codes_s, gen_s(jnp.int32(i)), jnp.int32(i))
    np.asarray(codes_s[:1, :1])
    print(f"phase4 {s_codec} encode: {time.time()-t0:.1f}s "
          f"({n/(time.time()-t0):.0f} rows/s)", flush=True)

    # ---- phase 5: walk sweep vs exact GT ---------------------------------
    adj_dev = adj
    pools = [int(p) for p in args.pools.split(",")]
    batches = [int(b) for b in args.batches.split(",")]
    rng = np.random.default_rng(7)

    for b in batches:
        xq_b = np.tile(xq_np, (-(-b // nq_gt), 1))[:b]
        xq_dev = jnp.asarray(xq_b)
        for pool in pools:
            try:
                def run():
                    s, p = graph_search(
                        codes_s, adj_dev, xq_dev, n, k, "INNER_PRODUCT",
                        pool=pool, width=args.width, codec=s_codec,
                        vmin=s_vmin, scale=s_scale, deg=args.deg)
                    return finalize_scores(s, p, "INNER_PRODUCT")
                dist, pos = run()
                np.asarray(pos[:1])
                best = float("inf")
                for _ in range(3):
                    t0 = time.time()
                    dist, pos = run()
                    pos_h = np.asarray(pos)
                    best = min(best, time.time() - t0)
                rec = float(np.mean([
                    len(set(pos_h[i][pos_h[i] >= 0]) & set(gt[i % nq_gt]))
                    / k for i in range(b)]))
                print(f"  walk b{b} ef={pool}: {b/best:7.0f} qps "
                      f"({best*1e3:.1f} ms)  recall@10 {rec:.3f}",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  walk b{b} ef={pool}: FAILED "
                      f"{type(e).__name__}: {str(e)[:140]}", flush=True)
                break
    print("MARCO-GRAPH COMPLETE", flush=True)


if __name__ == "__main__":
    main()
