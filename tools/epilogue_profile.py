"""Decompose the marco b1024 serving batch: scan vs epilogue vs glue.

VERDICT r4 weak #2 / next-round ask #1: the pair scan runs at the
~290 GiB/s HBM floor (~45 ms at marco b1024 np16) yet the end-to-end
batch costs ~235 ms.  This tool builds the frozen 8.8M x 1536 SQ6 index
(cached centroids + pass A make that ~190 s) and times every stage of
the public-API call separately, with block_until_ready between stages:

  upload        host->device queries
  coarse        _coarse_topk (jit)
  tiles         build_pair_tiles (jit)
  pairs_raw     pair kernel only (debug_raw=True — no epilogue)
  pairs_full    pair kernel + pv gather + exact_topk + rerank (one jit)
  spill         XLA spill scan leg (SQ6 spill stays on ivf_spill_scan)
  merge+fin     merge_topk + finalize_scores (eager glue today)
  fused         ONE jit over coarse->pairs->spill->merge->finalize
  fetch         device->host result fetch
  api           the full public dfx.faiss_search call

If `fused` is much cheaper than the staged sum, the gap is inter-jit
glue/dispatch overhead through the relay and the fix is a fused dispatch
path; if not, the dominant stage is the kernel-level target.

Usage (real TPU):
  env PYTHONPATH=/root/repo:/root/.axon_site \
      tools/chiplock.sh 3000 python tools/epilogue_profile.py \
      [--storage SQ6] [--nprobe 16] [--batch 1024]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def best_of(fn, iters=5):
    fn()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--storage", default="SQ6")
    ap.add_argument("--nprobe", type=int, default=16)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--n", type=int, default=8_841_823)
    args = ap.parse_args()

    import runpy

    # Build the frozen index exactly like the round-4 SQ6 sweep; restrict
    # the built-in sweep to one cheap point (we re-measure below).
    sys.argv = ["marco_device.py", "--storage", args.storage,
                "--metric", "IP", "--unit-norm", "--assign-topk", "4",
                "--budget-gb", "13.5", "--n", str(args.n),
                "--nprobes", str(args.nprobe), "--batches", "48"]
    runpy.run_path("tools/marco_device.py", run_name="__main__")

    import jax
    import jax.numpy as jnp

    import duckdb_faiss_ext_tpu as dfx
    from duckdb_faiss_ext_tpu.catalog import GLOBAL_CATALOG
    from duckdb_faiss_ext_tpu.models.ivf_serve import (_coarse_topk,
                                                       _sq_kscan)
    from duckdb_faiss_ext_tpu.ops.ivf_scan import (ivf_spill_scan,
                                                   merge_topk)
    from duckdb_faiss_ext_tpu.ops.flat_search import finalize_scores
    from duckdb_faiss_ext_tpu.ops.pallas_ivf_pairs import (
        pallas_ivf_sq_pairs_search)
    from duckdb_faiss_ext_tpu.utils.config import config, sq_int8_active

    idx = GLOBAL_CATALOG.get("marco").index
    nq, k = args.batch, 10
    nprobe = args.nprobe
    z = np.load([p for p in __import__("glob").glob(
        "/root/repo/.marco_passA_*_un_ip2_h*.npz")][0])
    xq_host = z["xq"]
    xq_big = xq_host[np.arange(nq) % xq_host.shape[0]].copy()
    params = {"nprobe": str(nprobe)}

    print("\n=== EPILOGUE DECOMPOSITION "
          f"(b{nq} np{nprobe} {args.storage}) ===", flush=True)

    # Full API reference point (f32 wire forced — the round-4 baseline).
    config.query_wire = "f32"
    t_api = best_of(lambda: dfx.faiss_search("marco", k, xq_big, params),
                    iters=5)
    print(f"api total (f32):  {t_api:8.1f} ms  "
          f"({nq / t_api * 1e3:.0f} qps)", flush=True)

    # Stage inputs (mirror _dispatch_inner's pairs branch).
    dev = idx._build_device_pallas()
    payload, counts, row_pos, cents_dev = dev[:4]
    rn_layout, rs_layout, vmin, scale = dev[4:8]
    spill = idx._device_spill
    lmax = (payload.shape[1] // 3 if idx.sq_type == "sq6"
            else payload.shape[1])
    k_kernel = min(k, nprobe * lmax)
    k_scan = _sq_kscan(idx, k_kernel, nprobe * lmax)
    marg = jnp.asarray(idx.metric_arg, jnp.float32)
    metric = idx.metric.name

    t_up = best_of(lambda: jnp.asarray(xq_big).block_until_ready())
    print(f"query upload:     {t_up:8.1f} ms", flush=True)
    xq_dev = jnp.asarray(xq_big)

    def coarse():
        return _coarse_topk(xq_dev, cents_dev, marg, nprobe=nprobe,
                            metric=metric,
                            precision=config.precision)
    t_co = best_of(lambda: coarse().block_until_ready())
    probe_ids = coarse()
    print(f"coarse topk:      {t_co:8.1f} ms", flush=True)

    from duckdb_faiss_ext_tpu.ops.pallas_ivf_pairs import (build_pair_tiles,
                                                           pairs_t_max)
    t_max = pairs_t_max(nq, nprobe, payload.shape[0])
    t_max = -(-t_max // 128) * 128
    t_ti = best_of(lambda: jax.block_until_ready(build_pair_tiles(
        probe_ids, nlist=payload.shape[0], t_max=t_max)))
    print(f"tile build:       {t_ti:8.1f} ms", flush=True)

    common = dict(k=k_kernel, k_scan=k_scan, nprobe=nprobe,
                  metric=metric, codec=idx.sq_type,
                  digit_dtype=config.sq_digit_dtype,
                  mega=config.pairs_impl == "mega")

    def pairs_raw():
        out = pallas_ivf_sq_pairs_search(
            payload, rn_layout, rs_layout, counts, row_pos, vmin, scale,
            probe_ids, xq_dev, None, debug_raw=True, **common)
        return jax.block_until_ready(out)
    t_raw = best_of(pairs_raw, iters=3)
    print(f"pairs raw only:   {t_raw:8.1f} ms   (kernel + tile build, "
          "no epilogue)", flush=True)

    def pairs_full():
        out = pallas_ivf_sq_pairs_search(
            payload, rn_layout, rs_layout, counts, row_pos, vmin, scale,
            probe_ids, xq_dev, None, **common)
        return jax.block_until_ready(out)
    t_pf = best_of(pairs_full, iters=3)
    print(f"pairs full:       {t_pf:8.1f} ms   (epilogue delta "
          f"{t_pf - t_raw:+.1f})", flush=True)
    scores, pos = pallas_ivf_sq_pairs_search(
        payload, rn_layout, rs_layout, counts, row_pos, vmin, scale,
        probe_ids, xq_dev, None, **common)

    t_sp = 0.0
    sp_out = None
    if spill is not None:
        sp_payload, sp_assign, sp_pos = spill[:3]
        sp_used = spill[3] if len(spill) > 3 else None
        sq_kw = dict(sq=idx.sq_type, sq_vmin=vmin, sq_scale=scale)
        if len(spill) > 4 and spill[4] is not None:
            sq_kw.update(spill_rn=spill[4], spill_rs=spill[5],
                         int8_dot=(idx.d >= 16 and sq_int8_active()),
                         int8_via=config.spill_int8_via)
        k_eff = min(k, nprobe * lmax + sp_pos.shape[0])

        def spill_leg():
            out = ivf_spill_scan(
                sp_payload, sp_assign, sp_pos, cents_dev, None,
                probe_ids, xq_dev, None, marg,
                k=min(k_eff, sp_pos.shape[0]), metric=metric,
                precision=config.precision, pq=False,
                codec=idx.pq_codec, n_used=sp_used, **sq_kw)
            return jax.block_until_ready(out)
        t_sp = best_of(spill_leg, iters=3)
        rows = sp_pos.shape[0] if sp_used is None else int(sp_used)
        print(f"spill scan:       {t_sp:8.1f} ms   ({rows} rows, XLA "
              "path)" if idx.sq_type == "sq6" else
              f"spill scan:       {t_sp:8.1f} ms   ({rows} rows)",
              flush=True)
        sp_out = ivf_spill_scan(
            sp_payload, sp_assign, sp_pos, cents_dev, None,
            probe_ids, xq_dev, None, marg,
            k=min(k_eff, sp_pos.shape[0]), metric=metric,
            precision=config.precision, pq=False,
            codec=idx.pq_codec, n_used=sp_used, **sq_kw)
    else:
        k_eff = min(k, nprobe * lmax)
        print("spill scan:            —      (no spill)", flush=True)

    def glue():
        s, p = scores, pos
        if sp_out is not None:
            s, p = merge_topk(s, p, sp_out[0], sp_out[1], k_eff)
        return jax.block_until_ready(finalize_scores(s, p, metric))
    t_gl = best_of(glue)
    print(f"merge+finalize:   {t_gl:8.1f} ms   (eager glue)", flush=True)
    dist_dev, pos_dev = glue()

    from duckdb_faiss_ext_tpu.utils.transfer import fetch_results
    t_fe = best_of(lambda: fetch_results(dist_dev, pos_dev))
    print(f"result fetch:     {t_fe:8.1f} ms", flush=True)

    staged = t_up + t_co + t_pf + t_sp + t_gl + t_fe
    print(f"staged sum:       {staged:8.1f} ms   (vs api {t_api:.1f})",
          flush=True)

    # ---- fp16 query wire A/B (utils/transfer.upload_queries) ------------
    t_up16 = best_of(lambda: jnp.asarray(
        xq_big.astype(np.float16)).astype(jnp.float32).block_until_ready())
    print(f"upload fp16:      {t_up16:8.1f} ms   (vs f32 {t_up:.1f})",
          flush=True)

    # ---- ONE fused jit over the whole device path -----------------------
    # Arrays passed as ARGUMENTS — a closure captures them as constants
    # and the remote compiler then serializes the 12 GiB payload
    # (wedged for >15 min on 2026-08-21; killed).
    sq_static = {kk: v for kk, v in sq_kw.items()
                 if kk in ("sq", "int8_dot", "int8_via")}

    def fused_body(xq_d, payload_a, rn_a, rs_a, counts_a, rp_a, vmin_a,
                   scale_a, cents_a, sp_payload_a, sp_assign_a, sp_pos_a,
                   sp_rn_a, sp_rs_a):
        pid = _coarse_topk(xq_d, cents_a, marg, nprobe=nprobe,
                           metric=metric, precision=config.precision)
        s, p = pallas_ivf_sq_pairs_search(
            payload_a, rn_a, rs_a, counts_a, rp_a, vmin_a, scale_a,
            pid, xq_d, None, **common)
        if spill is not None:
            sp = ivf_spill_scan(
                sp_payload_a, sp_assign_a, sp_pos_a, cents_a, None,
                pid, xq_d, None, marg,
                k=min(k_eff, sp_pos_a.shape[0]), metric=metric,
                precision=config.precision, pq=False,
                codec=idx.pq_codec, n_used=sp_used,
                sq_vmin=vmin_a, sq_scale=scale_a,
                spill_rn=sp_rn_a, spill_rs=sp_rs_a, **sq_static)
            s, p = merge_topk(s, p, sp[0], sp[1], k_eff)
        return finalize_scores(s, p, metric)

    fused = jax.jit(fused_body)
    fargs = (payload, rn_layout, rs_layout, counts, row_pos, vmin, scale,
             cents_dev, sp_payload, sp_assign, sp_pos,
             sq_kw.get("spill_rn"), sq_kw.get("spill_rs"))
    t0 = time.perf_counter()
    jax.block_until_ready(fused(xq_dev, *fargs))
    print(f"fused compile:    {(time.perf_counter()-t0)*1e3:8.1f} ms",
          flush=True)
    t_fu = best_of(lambda: jax.block_until_ready(fused(xq_dev, *fargs)),
                   iters=5)
    print(f"fused device:     {t_fu:8.1f} ms   (coarse+pairs+spill+"
          "merge+finalize in ONE jit)", flush=True)

    def fused_e2e():
        d, p = fused(jnp.asarray(xq_big.astype(np.float16))
                     .astype(jnp.float32), *fargs)
        return fetch_results(d, p)
    t_f2 = best_of(fused_e2e, iters=5)
    print(f"fused e2e fp16:   {t_f2:8.1f} ms   (upload+fused+fetch = "
          f"{nq / t_f2 * 1e3:.0f} qps)", flush=True)

    # ---- the public API again, now with the fp16 wire default ----------
    config.query_wire = "auto"
    t_api2 = best_of(lambda: dfx.faiss_search("marco", k, xq_big, params),
                     iters=5)
    print(f"api fp16 wire:    {t_api2:8.1f} ms  "
          f"({nq / t_api2 * 1e3:.0f} qps)", flush=True)

    # Recall + latency A/B across wire formats on the GT queries.
    gt = z["gt"] if "gt" in z.files else None
    if gt is not None:
        def recall_of(res):
            return float(np.mean([
                len(set(a[a >= 0]) & set(b)) / k
                for a, b in zip(res["label"][:256], gt)]))
        for wire in ("f32", "f16", "sq8"):
            config.query_wire = wire
            t = best_of(lambda: dfx.faiss_search("marco", k, xq_big,
                                                 params), iters=3)
            r = recall_of(dfx.faiss_search("marco", k, xq_big, params))
            print(f"wire {wire}: {t:8.1f} ms  recall@10 {r:.4f}",
                  flush=True)
        config.query_wire = "auto"

    # Pipelined serving with the fp16 wire (the honest throughput tier).
    qbig = xq_host[np.arange(2048) % xq_host.shape[0]]
    dfx.faiss_search_batched("marco", k, qbig, params, batch_size=256)
    t0 = time.perf_counter()
    dfx.faiss_search_batched("marco", k, qbig, params, batch_size=256)
    qps = 2048 / (time.perf_counter() - t0)
    print(f"pipelined 8xb256: {qps:.1f} qps", flush=True)
    dfx.faiss_search_batched("marco", k, qbig, params, batch_size=1024)
    t0 = time.perf_counter()
    dfx.faiss_search_batched("marco", k, qbig, params, batch_size=1024)
    qps = 2048 / (time.perf_counter() - t0)
    print(f"pipelined 2xb1024: {qps:.1f} qps", flush=True)
    print("EPILOGUE-PROFILE COMPLETE", flush=True)


if __name__ == "__main__":
    main()
