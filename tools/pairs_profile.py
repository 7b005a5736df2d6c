"""Kernel-level decomposition of the pair-tile IVF scan + spill scan A/B.

No index build: synthetic SQ payloads go straight into the ops functions,
so a full sweep costs minutes, not an 8.8M ingest.  Measures, at a
marco-like shape (nlist 4096, d 1536, b1024, nprobe 16):

1. pairs full-search time across (qg, ways) configs + label agreement
   vs the per-query kernel (chip revalidation of the shared digit-dot);
2. the same with a single-hot-list probe table (DMA always skipped) —
   isolates per-tile COMPUTE from payload DMA;
3. decomposition: tile-table build / kernel / epilogue split;
4. spill scan: int8->int32 einsum vs bf16-cast digit dots (ivf_scan
   int8_via A/B) at a 512k-row spill.

Usage (real TPU): env PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/pairs_profile.py [--lmax 1024] [--sweep-qg 8,16,32]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def timed(fn, *a, reps=3, **kw):
    out = fn(*a, **kw)
    jax_block(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        jax_block(fn(*a, **kw))
        best = min(best, time.time() - t0)
    return best, out


def jax_block(out):
    """Force completion through the relay (block_until_ready is a no-op
    there): fetch one small reduction."""
    import jax
    import jax.numpy as jnp

    x = jax.tree_util.tree_leaves(out)[0]
    if getattr(x, "ndim", 0):
        x = jnp.sum(x[..., :1].astype(jnp.float32))
    np.asarray(x)


def rand_u8(k, shape):
    """Random uint8 payload without int32 blowups.

    random.randint/bits at u8 materialize 4x int32 intermediates (25 GB
    at the 12.9 GiB marco payload); a (flat, 4) u8 byte-split pads 32x
    on TPU (T(8,128) tiling of a 4-wide minor dim); and a flat staging
    buffer + final reshape holds TWO payload-sized copies (both OOMed
    on-chip 2026-08-20).  So: chunk along axis 0 of the TARGET-shaped
    donated buffer, generate u32 words per chunk, and lay each word's 4
    shifted bytes out as consecutive 1-D segments (the payload is
    random — byte order is irrelevant).  Peak = buffer + one chunk."""
    import functools

    import jax
    import jax.numpy as jnp

    rows = shape[0]
    inner = int(np.prod(shape[1:], dtype=np.int64))
    nch = next(c for c in (16, 8, 4, 2, 1)
               if rows % c == 0 and (rows // c) * inner % 4 == 0)
    rch = rows // nch
    ch = rch * inner // 4

    @functools.partial(jax.jit, donate_argnums=(0,))
    def upd(buf, kc, row):
        wds = jax.random.bits(kc, (ch,), jnp.uint32)
        b = jnp.concatenate([(wds >> (8 * j)).astype(jnp.uint8)
                             for j in range(4)], axis=0)
        b = b.reshape((rch,) + tuple(shape[1:]))
        return jax.lax.dynamic_update_slice(
            buf, b, (row,) + (0,) * (len(shape) - 1))

    buf = jnp.zeros(shape, jnp.uint8)
    for i in range(nch):
        buf = upd(buf, jax.random.fold_in(k, i), jnp.int32(i) * rch)
    jax_block(buf)
    return buf


def crossover_sweep() -> None:
    """Measure the pairs/per-query crossover across a (d, lmax, nq) grid
    and emit ops/pairs_gate.py MEASURED rows (VERDICT round-2 #8).

    nlist is fixed at 1024 and nprobe at 16 — the gate's features are
    (lmax*d, nq); nprobe mostly scales both paths together (it grows the
    per-query DMA count and the pair-tile count linearly)."""
    import jax
    import jax.numpy as jnp

    from duckdb_faiss_ext_tpu.ops import pallas_ivf_pairs as pp
    from duckdb_faiss_ext_tpu.ops.pallas_ivf import pallas_ivf_sq_search
    from duckdb_faiss_ext_tpu.utils.config import on_tpu

    interp = not on_tpu()
    nlist, nprobe, codec = 1024, 16, "sq8"
    key = jax.random.PRNGKey(0)
    rows = []
    grid = [
        (128, 512), (128, 2048), (128, 4096),
        (768, 1024),
        (1536, 512), (1536, 1024), (1536, 2048),
    ]
    for d, lmax in grid:
        k1, k2, k3, k4 = jax.random.split(jax.random.fold_in(key, lmax * d),
                                          4)
        payload = rand_u8(k1, (nlist, lmax, d))
        row_norm = jax.random.uniform(k2, (nlist, lmax), jnp.float32,
                                      100.0, 200.0)
        row_sum = jax.random.uniform(k2, (nlist, lmax), jnp.float32,
                                     100.0 * d / 256, 200.0 * d / 256)
        counts = jnp.full((nlist,), lmax, jnp.int32)
        row_pos = jnp.arange(nlist * lmax, dtype=jnp.int32) \
            .reshape(nlist, lmax)
        vmin = jnp.full((d,), -0.03, jnp.float32)
        scale = jnp.full((d,), 0.06 / 255, jnp.float32)
        for nq in (256, 1024):
            xq = jax.random.normal(k3, (nq, d), jnp.float32)
            xq = xq / jnp.linalg.norm(xq, axis=1, keepdims=True)
            probe_ids = jax.random.randint(k4, (nq, nprobe), 0, nlist,
                                           jnp.int32)
            kw = dict(k=10, k_scan=72, nprobe=nprobe,
                      metric="INNER_PRODUCT", codec=codec)
            try:
                t_ref, r_ref = timed(
                    pallas_ivf_sq_search, payload, row_norm, row_sum,
                    counts, row_pos, vmin, scale, probe_ids, xq, None,
                    interpret=interp, **kw)
                t_pair, r_pair = timed(
                    pp.pallas_ivf_sq_pairs_search, payload, row_norm,
                    row_sum, counts, row_pos, vmin, scale, probe_ids,
                    xq, None, qg=8, interpret=interp, **kw)
            except Exception as e:  # noqa: BLE001
                print(f"  d={d} lmax={lmax} nq={nq}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
                continue
            agree = float(np.mean([
                len(set(a) & set(b)) / 10
                for a, b in zip(np.asarray(r_pair[1]),
                                np.asarray(r_ref[1]))]))
            ratio = t_ref / t_pair
            rows.append((lmax * d, nq, ratio))
            print(f"  d={d:5d} lmax={lmax:5d} nq={nq:5d}: per-query "
                  f"{t_ref*1e3:7.1f} ms, pairs {t_pair*1e3:7.1f} ms, "
                  f"ratio {ratio:5.2f}, agree {agree:.4f}", flush=True)
        del payload
    print("MEASURED rows for ops/pairs_gate.py:", flush=True)
    for w, n, r in rows:
        print(f"    ({w}, {n}, {r:.3f}),", flush=True)
    print("CROSSOVER-SWEEP COMPLETE", flush=True)


def flat_ab(args) -> None:
    """Flat pairs kernel standard-vs-mega A/B at the 1M x 128 bench
    shape (nlist 4096, lmax 256): the headline ivf_qps_b1024 rides this
    kernel, and ~4000 tiles x 12.5 us/step is most of its 69 ms."""
    import jax
    import jax.numpy as jnp

    from duckdb_faiss_ext_tpu.ops import pallas_ivf_pairs as pp
    from duckdb_faiss_ext_tpu.utils.config import on_tpu

    interp = not on_tpu()
    nlist, lmax, d, nq, nprobe = 4096, 256, 128, args.nq, 64
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    payload = jax.random.normal(k1, (nlist, lmax, d), jnp.float32)
    counts = jnp.full((nlist,), lmax, jnp.int32)
    row_pos = jnp.arange(nlist * lmax, dtype=jnp.int32) \
        .reshape(nlist, lmax)
    xq = jax.random.normal(k2, (nq, d), jnp.float32)
    probe_ids = jax.random.randint(k3, (nq, nprobe), 0, nlist, jnp.int32)
    kw = dict(k=10, k_scan=72, nprobe=nprobe, metric="INNER_PRODUCT")
    print(f"flat payload {nlist}x{lmax}x{d} fp32 = "
          f"{nlist * lmax * d * 4 / (1 << 30):.1f} GiB, b{nq} "
          f"nprobe={nprobe}", flush=True)
    res = {}
    for mega in (False, True):
        t, r = timed(pp.pallas_ivf_pairs_search, payload, counts,
                     row_pos, probe_ids, xq, None, mega=mega,
                     interpret=interp, **kw)
        res[mega] = (t, np.asarray(r[1]))
        print(f"  flat pairs mega={mega}: {t*1e3:7.1f} ms", flush=True)
    agree = float(np.mean([len(set(a) & set(b)) / 10 for a, b in
                           zip(res[False][1], res[True][1])]))
    print(f"  label agreement: {agree:.4f}", flush=True)
    print("FLAT-AB COMPLETE", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--crossover", action="store_true",
                    help="pairs/per-query crossover grid -> gate table")
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--lmax", type=int, default=1024)
    ap.add_argument("--d", type=int, default=1536)
    ap.add_argument("--nq", type=int, default=1024)
    ap.add_argument("--nprobe", type=int, default=16)
    ap.add_argument("--codec", default="sq8")
    ap.add_argument("--metric", default="INNER_PRODUCT")
    ap.add_argument("--sweep-qg", default="8,16,32")
    ap.add_argument("--spill", type=int, default=524288)
    ap.add_argument("--skip-pairs", action="store_true")
    ap.add_argument("--skip-spill", action="store_true")
    ap.add_argument("--skip-sweeps", action="store_true",
                    help="skip the (qg, ways)/sweep/hot A/Bs but keep "
                         "the tiles/kernel/epilogue decomposition")
    ap.add_argument("--flat", action="store_true",
                    help="flat (fp32) pairs kernel standard-vs-mega A/B "
                         "at the bench shape (nlist 4096, lmax 256, "
                         "d 128)")
    args = ap.parse_args()

    if args.crossover:
        crossover_sweep()
        return

    if args.flat:
        flat_ab(args)
        return

    import jax
    import jax.numpy as jnp

    from duckdb_faiss_ext_tpu.ops import pallas_ivf_pairs as pp
    from duckdb_faiss_ext_tpu.ops.pallas_ivf import pallas_ivf_sq_search
    from duckdb_faiss_ext_tpu.utils.config import on_tpu

    interp = not on_tpu()

    nlist, lmax, d = args.nlist, args.lmax, args.d
    nq, nprobe, codec = args.nq, args.nprobe, args.codec
    metric = args.metric
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    w = {"sq8": d, "sq4": (d + 1) // 2, "sq6": 3 * ((d + 3) // 4)}[codec]

    if codec == "sq6":
        payload = rand_u8(k1, (nlist, 3, lmax, (d + 3) // 4))
    else:
        payload = rand_u8(k1, (nlist, lmax, w))
    # rn/rs only need to be CONSISTENT across kernels for agreement
    # checks (both consume the same values); plausible magnitudes keep
    # the score math well-conditioned.
    row_norm = jax.random.uniform(k2, (nlist, lmax), jnp.float32,
                                  100.0, 200.0)
    row_sum = jax.random.uniform(k2, (nlist, lmax), jnp.float32,
                                 100.0 * d / 256, 200.0 * d / 256)
    counts = jnp.full((nlist,), lmax, jnp.int32)
    row_pos = jnp.arange(nlist * lmax, dtype=jnp.int32).reshape(nlist,
                                                                lmax)
    vmin = jnp.full((d,), -0.03, jnp.float32)
    scale = jnp.full((d,), 0.06 / 255, jnp.float32)
    xq = jax.random.normal(k3, (nq, d), jnp.float32)
    xq = xq / jnp.linalg.norm(xq, axis=1, keepdims=True)
    probe_ids = jax.random.randint(k4, (nq, nprobe), 0, nlist, jnp.int32)
    hot_ids = jnp.broadcast_to(jnp.arange(nprobe, dtype=jnp.int32),
                               (nq, nprobe))
    kw = dict(k=10, k_scan=72, nprobe=nprobe, metric=metric, codec=codec)
    gb = float(np.prod(payload.shape)) / (1 << 30)
    print(f"payload {nlist}x{lmax}x{w} {codec} = {gb:.1f} GiB, b{nq} "
          f"nprobe={nprobe} {metric}", flush=True)

    if not args.skip_pairs:
        if not args.skip_sweeps:
            t_ref, r_ref = timed(
                pallas_ivf_sq_search, payload, row_norm, row_sum, counts,
                row_pos, vmin, scale, probe_ids, xq, None,
                interpret=interp, **kw)
            print(f"  per-query kernel: {t_ref*1e3:7.1f} ms", flush=True)

        results = {}
        for qg in ([] if args.skip_sweeps
                   else [int(x) for x in args.sweep_qg.split(",")]):
            for ways in (1, 2, 4):
                per_way = 2 * lmax * w + 2 * qg * lmax * 4 + qg * 4 * w
                if ways * per_way > (13 << 20):
                    continue
                try:
                    t, r = timed(
                        pp.pallas_ivf_sq_pairs_search, payload, row_norm,
                        row_sum, counts, row_pos, vmin, scale, probe_ids,
                        xq, None, qg=qg, ways_opt=ways, interpret=interp,
                        **kw)
                except Exception as e:  # noqa: BLE001
                    print(f"  pairs qg={qg} ways={ways}: FAILED "
                          f"{type(e).__name__}: {str(e)[:120]}",
                          flush=True)
                    continue
                agree = float(np.mean([
                    len(set(a) & set(b)) / 10
                    for a, b in zip(np.asarray(r[1]),
                                    np.asarray(r_ref[1]))]))
                results[(qg, ways)] = t
                print(f"  pairs qg={qg:3d} ways={ways}: {t*1e3:7.1f} ms "
                      f"({t_ref/t:4.2f}x per-query)  agree {agree:.4f}",
                      flush=True)
        # Full-corpus static sweep (tile i = list i, static index map):
        # the pair tiles' scalar-prefetch-driven DMA measured ~75 us of
        # per-tile overhead at the marco shape; the sweep isolates it.
        maxc = int(np.bincount(np.asarray(probe_ids).reshape(-1),
                               minlength=nlist).max())
        qcap0 = 8
        while qcap0 < maxc:
            qcap0 *= 2
        # Also force qcap=32: the dot M dim then meets the MXU's (32,
        # 128) int8 tile — isolates M-underfill from tile-count effects
        # (the hot-list A/B showed ~90% of the scan is non-DMA cost).
        for qcap in () if args.skip_sweeps else dict.fromkeys((qcap0, 32)):
            raw_gb = nlist * qcap * lmax * 4 / (1 << 30)
            if raw_gb > 1.5:
                print(f"  sweep skipped: raw tile buffer {raw_gb:.1f} GiB "
                      f"(qcap {qcap})", flush=True)
                continue
            t_sw, r_sw = timed(
                pp.pallas_ivf_sq_pairs_search, payload, row_norm,
                row_sum, counts, row_pos, vmin, scale, probe_ids, xq,
                None, qg=qcap, ways_opt=1, sweep=True, interpret=interp,
                **kw)
            agree = float(np.mean([
                len(set(a) & set(b)) / 10
                for a, b in zip(np.asarray(r_sw[1]),
                                np.asarray(r_ref[1]))]))
            print(f"  sweep qcap={qcap} (maxc {maxc}): {t_sw*1e3:7.1f} ms "
                  f"({t_ref/t_sw:4.2f}x per-query)  agree {agree:.4f}",
                  flush=True)

        # Hot-list probe table: every tile maps one of nprobe lists ->
        # payload DMA skipped after the first fetch of each.
        best_cfg = min(results, key=results.get) if results else (8, 2)
        qg, ways = best_cfg
        if not args.skip_sweeps:
            t_hot, _ = timed(
                pp.pallas_ivf_sq_pairs_search, payload, row_norm, row_sum,
                counts, row_pos, vmin, scale, hot_ids, xq, None,
                qg=qg, ways_opt=ways, interpret=interp, **kw)
            print(f"  pairs hot-lists qg={qg} ways={ways}: "
                  f"{t_hot*1e3:7.1f} ms (compute-only regime)", flush=True)

        # Mega-step kernel (hand-rolled DMA, tps tiles per grid step):
        # the automatic pipeline pays ~12.5 us per grid step (mxu_probe
        # no-op, 2026-08-20) — this is the candidate fix.
        for dd in ("bf16", "int8"):
            try:
                t_mg, r_mg = timed(
                    pp.pallas_ivf_sq_pairs_search, payload, row_norm,
                    row_sum, counts, row_pos, vmin, scale, probe_ids, xq,
                    None, qg=qg, mega=True, digit_dtype=dd,
                    interpret=interp, **kw)
            except Exception as e:  # noqa: BLE001
                print(f"  pairs MEGA digit_dtype={dd}: FAILED "
                      f"{type(e).__name__}: {str(e)[:140]}", flush=True)
                continue
            agree = (float(np.mean([
                len(set(a) & set(b)) / 10
                for a, b in zip(np.asarray(r_mg[1]),
                                np.asarray(r_ref[1]))]))
                if not args.skip_sweeps else float("nan"))
            print(f"  pairs MEGA digit_dtype={dd}: {t_mg*1e3:7.1f} ms "
                  f"(agree {agree:.4f})", flush=True)

        # Digit-dot dtype A/B at the best config: bf16-cast operands
        # (MXU) vs s8xs8 dot_general (suspected VPU lowering at small M).
        for dd in ("bf16", "int8"):
            t_dd, r_dd = timed(
                pp.pallas_ivf_sq_pairs_search, payload, row_norm, row_sum,
                counts, row_pos, vmin, scale, probe_ids, xq, None,
                qg=qg, ways_opt=ways, digit_dtype=dd, interpret=interp,
                **kw)
            print(f"  pairs digit_dtype={dd}: {t_dd*1e3:7.1f} ms",
                  flush=True)
            if not args.skip_sweeps:
                t_dq, _ = timed(
                    pallas_ivf_sq_search, payload, row_norm, row_sum,
                    counts, row_pos, vmin, scale, probe_ids, xq, None,
                    digit_dtype=dd, interpret=interp, **kw)
                print(f"  per-query digit_dtype={dd}: {t_dq*1e3:7.1f} ms",
                      flush=True)

        # Decomposition at the best config.
        if best_cfg not in results:
            t, _ = timed(
                pp.pallas_ivf_sq_pairs_search, payload, row_norm, row_sum,
                counts, row_pos, vmin, scale, probe_ids, xq, None,
                qg=qg, ways_opt=ways, interpret=interp, **kw)
            results[best_cfg] = t
            print(f"  pairs qg={qg} ways={ways}: {t*1e3:7.1f} ms",
                  flush=True)
        t_max = pp.pairs_t_max(nq, nprobe, nlist, qg)
        t_max = -(-t_max // ways) * ways

        @jax.jit
        def tiles_only(pids):
            tl, tq, ps, nt = pp.build_pair_tiles(pids, nlist=nlist,
                                                 t_max=t_max, qg=qg)
            return tl.sum() + tq.sum() + ps.sum() + nt

        t_tiles, _ = timed(tiles_only, probe_ids)

        from duckdb_faiss_ext_tpu.ops.flat_search import exact_topk
        from duckdb_faiss_ext_tpu.ops.pallas_ivf import sq_exact_rerank

        raw_fake = jax.random.normal(k2, (t_max, qg, lmax), jnp.float32)
        _, _, pair_slot, _ = pp.build_pair_tiles(
            probe_ids, nlist=nlist, t_max=t_max, qg=qg)

        @jax.jit
        def epi_only(raw, ps):
            pv = (raw.reshape(t_max * qg, lmax)[ps.reshape(-1)]
                  .reshape(nq, nprobe * lmax))
            best, sel = exact_topk(pv, kw["k_scan"])
            lane = sel % lmax
            lids = jnp.take_along_axis(probe_ids, sel // lmax, axis=1)
            pos = row_pos[lids, lane]
            return sq_exact_rerank(payload, lids, lane, pos, best, xq,
                                   vmin, scale, codec=codec, k=10,
                                   metric=metric)

        t_epi, _ = timed(epi_only, raw_fake, pair_slot)
        t_full = results.get(best_cfg, float("nan"))
        print(f"  decomposition qg={qg} ways={ways}: tiles "
              f"{t_tiles*1e3:.1f} ms + kernel "
              f"{(t_full-t_tiles-t_epi)*1e3:.1f} ms + epilogue "
              f"{t_epi*1e3:.1f} ms = {t_full*1e3:.1f} ms", flush=True)
        del raw_fake, pair_slot

    if not args.skip_spill:
        del payload
        from duckdb_faiss_ext_tpu.ops.ivf_scan import ivf_spill_scan

        s = args.spill
        sp_payload = rand_u8(k1, (s, w))
        sp_assign = jax.random.randint(k2, (s,), 0, nlist, jnp.int32)
        sp_pos = jnp.arange(s, dtype=jnp.int32)
        sp_rn = jax.random.uniform(k3, (s,), jnp.float32, 100.0, 200.0)
        sp_rs = jax.random.uniform(k3, (s,), jnp.float32, 100.0 * d / 256,
                                   200.0 * d / 256)
        cents = jax.random.normal(k4, (nlist, d), jnp.float32)
        skw = dict(k=10, metric=metric,
                   precision=jax.lax.Precision.DEFAULT, sq=codec,
                   sq_vmin=vmin, sq_scale=scale, n_used=s,
                   spill_rn=sp_rn, spill_rs=sp_rs, int8_dot=True)
        res = {}
        for via in ("int32", "bf16"):
            t, r = timed(ivf_spill_scan, sp_payload, sp_assign, sp_pos,
                         cents, None, probe_ids, xq, None,
                         jnp.float32(0), int8_via=via, **skw)
            res[via] = (t, np.asarray(r[1]))
            print(f"  spill {s} rows int8_via={via}: {t*1e3:7.1f} ms "
                  f"({t/s/nq*1e12:.1f} ps/row/query)", flush=True)
        agree = float(np.mean([len(set(a) & set(b)) / 10 for a, b in
                               zip(res["int32"][1], res["bf16"][1])]))
        print(f"  spill label agreement int32 vs bf16: {agree:.4f}",
              flush=True)

        # Decompose: which stage owns the spill time?  Reconstructs the
        # scan's stages as standalone loops over the same chunking.
        from duckdb_faiss_ext_tpu.ops.flat_search import exact_topk
        from duckdb_faiss_ext_tpu.ops.sq import (SQ_INT8_SHIFT,
                                                 sq_query_digits,
                                                 sq_unpack_i8)

        sc = 16384
        n_chunks = s // sc
        u8q = xq * scale[None, :]
        hi8, lo8, su28, mu8, _ = sq_query_digits(u8q)
        k_scan = 36

        @jax.jit
        def dots_only(hi8, lo8):
            def body(i, acc):
                plc = jax.lax.dynamic_slice(sp_payload, (i * sc, 0),
                                            (sc, w))
                xc8 = sq_unpack_i8(plc, d, codec)
                qb2 = jnp.concatenate([hi8, lo8], axis=0) \
                    .astype(jnp.bfloat16)
                dot2 = jnp.einsum("qd,cd->qc", qb2,
                                  xc8.astype(jnp.bfloat16),
                                  preferred_element_type=jnp.float32)
                return acc + dot2[0, 0] + dot2[nq, 0]
            return jax.lax.fori_loop(0, n_chunks, body, 0.0)

        @jax.jit
        def member_only():
            qidx = jax.lax.broadcasted_iota(jnp.int32, probe_ids.shape, 0)
            onehot_t = (jnp.zeros((nlist, nq), jnp.bool_)
                        .at[probe_ids, qidx].set(True))

            def body(i, acc):
                asg_c = jax.lax.dynamic_slice(sp_assign, (i * sc,), (sc,))
                probed = jnp.take(onehot_t, asg_c, axis=0).T
                return acc + jnp.sum(probed[:, :1])
            return jax.lax.fori_loop(0, n_chunks, body, 0)

        @jax.jit
        def topk_only(fake):
            def body(i, carry):
                bs, bi = carry
                score = jax.lax.dynamic_slice(
                    fake, (0, 0), (nq, sc)) + jnp.float32(i)
                ch_s, ch_i = exact_topk(score, k_scan)
                cat_s = jnp.concatenate([bs, ch_s], axis=1)
                cat_i = jnp.concatenate([bi, ch_i], axis=1)
                new_s, sel = jax.lax.top_k(cat_s, k_scan)
                return new_s, jnp.take_along_axis(cat_i, sel, axis=1)
            init = (jnp.full((nq, k_scan), -jnp.inf, jnp.float32),
                    jnp.full((nq, k_scan), -1, jnp.int32))
            return jax.lax.fori_loop(0, n_chunks, body, init)

        t, _ = timed(dots_only, hi8, lo8)
        print(f"  spill stage dots+unpack: {t*1e3:7.1f} ms", flush=True)
        t, _ = timed(member_only)
        print(f"  spill stage membership:  {t*1e3:7.1f} ms", flush=True)
        fake = jax.random.normal(k2, (nq, sc), jnp.float32)
        t, _ = timed(topk_only, fake)
        print(f"  spill stage topk+merge:  {t*1e3:7.1f} ms", flush=True)

    print("PAIRS-PROFILE COMPLETE", flush=True)


if __name__ == "__main__":
    main()
