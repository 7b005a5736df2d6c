"""Compile + run ONE small mega-step pairs call on the real chip with
full tracebacks — captures the Mosaic error that the relay's compile
helper reports only as HTTP 500 (seen 2026-08-20 in master3b), and
label-checks against the grid kernel when it does lower.

Usage: env PYTHONPATH=/root/repo:/root/.axon_site \
    JAX_TRACEBACK_FILTERING=off python tools/mega_debug.py [--flat]
"""

from __future__ import annotations

import argparse

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--flat", action="store_true")
    ap.add_argument("--nlist", type=int, default=64)
    ap.add_argument("--lmax", type=int, default=256)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--nq", type=int, default=64)
    ap.add_argument("--nprobe", type=int, default=8)
    ap.add_argument("--tps", type=int, default=0,
                    help="force tiles per mega step (bisect knob)")
    ap.add_argument("--slots", type=int, default=0,
                    help="force in-flight slot count (bisect knob)")
    ap.add_argument("--no-skip", action="store_true",
                    help="copy padding tiles too (bisect knob)")
    ap.add_argument("--utile", type=int, default=0,
                    help="force the mega digit-dot sub-tile rows")
    ap.add_argument("--only", choices=["grid", "mega"], default=None,
                    help="compile+run just one kernel (isolate a "
                         "remote-compile HTTP 500)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from duckdb_faiss_ext_tpu.ops import pallas_ivf_pairs as pp
    from duckdb_faiss_ext_tpu.utils.config import on_tpu

    interp = not on_tpu()
    print(f"backend: {jax.devices()[0].platform}, interpret={interp}",
          flush=True)
    nlist, lmax, d, nq, nprobe = (args.nlist, args.lmax, args.d, args.nq,
                                  args.nprobe)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    counts = jnp.full((nlist,), lmax, jnp.int32)
    row_pos = jnp.arange(nlist * lmax, dtype=jnp.int32).reshape(nlist,
                                                                lmax)
    xq = jax.random.normal(k2, (nq, d), jnp.float32)
    # DISTINCT probe ids per query (top-k over random scores) — real
    # serving probes the k nearest centroids, always distinct.  randint
    # WITH replacement duplicated (query, list) pairs, every duplicated
    # list's rows surfaced twice in the top-10, and the set-overlap
    # metric then capped at mean|set|/10 = 0.9562 — the round-3 "mega
    # kernel race" was exactly this tool artifact (self-agreement of
    # the grid kernel measured the same 0.9562).
    pscore = jax.random.uniform(k3, (nq, nlist))
    probe_ids = jax.lax.top_k(pscore, nprobe)[1].astype(jnp.int32)

    if args.flat:
        payload = jax.random.normal(k1, (nlist, lmax, d), jnp.float32)
        kw = dict(k=10, k_scan=40, nprobe=nprobe, metric="INNER_PRODUCT")
        r1 = pp.pallas_ivf_pairs_search(payload, counts, row_pos,
                                        probe_ids, xq, None,
                                        interpret=interp, **kw)
        r2 = pp.pallas_ivf_pairs_search(payload, counts, row_pos,
                                        probe_ids, xq, None, mega=True,
                                        interpret=interp, **kw)
    else:
        # Chunked generation: randint over the whole (nlist, lmax, d)
        # materializes int32/uint32 intermediates (4x the payload — 48 GB
        # at the marco shape).  fori_loop + dynamic_update_slice keeps
        # one uint8 buffer plus a ~200 MB per-chunk transient.
        from jax import lax as jlax

        cl = max(1, min(nlist, (64 << 20) // max(lmax * d, 1)))
        while nlist % cl:
            cl -= 1

        @jax.jit
        def gen_payload(key):
            def body(i, buf):
                ki = jax.random.fold_in(key, i)
                blk = jax.random.bits(ki, (cl, lmax, d), jnp.uint8)
                return jlax.dynamic_update_slice(buf, blk, (i * cl, 0, 0))
            return jlax.fori_loop(0, nlist // cl, body,
                                  jnp.zeros((nlist, lmax, d), jnp.uint8))

        payload = gen_payload(k1)
        rn = jax.random.uniform(k2, (nlist, lmax), jnp.float32, 100, 200)
        rs = jax.random.uniform(k2, (nlist, lmax), jnp.float32, 50, 100)
        vmin = jnp.full((d,), -0.03, jnp.float32)
        scale = jnp.full((d,), 0.06 / 255, jnp.float32)
        kw = dict(k=10, k_scan=40, nprobe=nprobe,
                  metric="INNER_PRODUCT", codec="sq8")
        mkw = {}
        if args.tps:
            mkw["tps_opt"] = args.tps
        if args.slots:
            mkw["slots_opt"] = args.slots
        if args.no_skip:
            mkw["mega_skip_pad"] = False
        if args.utile:
            mkw["utile_opt"] = args.utile
        print(f"mega knobs: {mkw}", flush=True)
        r1 = r2 = None
        if args.only != "mega":
            r1 = pp.pallas_ivf_sq_pairs_search(
                payload, rn, rs, counts, row_pos, vmin, scale, probe_ids,
                xq, None, interpret=interp, **kw)
            print("grid kernel ran", flush=True)
        if args.only != "grid":
            r2 = pp.pallas_ivf_sq_pairs_search(
                payload, rn, rs, counts, row_pos, vmin, scale, probe_ids,
                xq, None, mega=True, digit_dtype="bf16", interpret=interp,
                **kw, **mkw)
            print("mega kernel ran", flush=True)
        if r1 is None or r2 is None:
            print("MEGA-DEBUG COMPLETE (single-kernel mode)", flush=True)
            return
    import time

    def best_of(fn, iters=3):
        fn()
        best = float("inf")
        for _ in range(iters):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return best * 1e3

    if not args.flat:
        tg = best_of(lambda: np.asarray(pp.pallas_ivf_sq_pairs_search(
            payload, rn, rs, counts, row_pos, vmin, scale, probe_ids,
            xq, None, interpret=interp, **kw)[0]))
        tgb = best_of(lambda: np.asarray(pp.pallas_ivf_sq_pairs_search(
            payload, rn, rs, counts, row_pos, vmin, scale, probe_ids,
            xq, None, digit_dtype="bf16", interpret=interp, **kw)[0]))
        tm = best_of(lambda: np.asarray(pp.pallas_ivf_sq_pairs_search(
            payload, rn, rs, counts, row_pos, vmin, scale, probe_ids,
            xq, None, mega=True, digit_dtype="bf16", interpret=interp,
            **kw, **mkw)[0]))
        tmi = best_of(lambda: np.asarray(pp.pallas_ivf_sq_pairs_search(
            payload, rn, rs, counts, row_pos, vmin, scale, probe_ids,
            xq, None, mega=True, digit_dtype="int8", interpret=interp,
            **kw, **mkw)[0]))
        print(f"grid int8 {tg:.1f} / grid bf16 {tgb:.1f} / "
              f"mega bf16 {tm:.1f} / mega int8 {tmi:.1f} ms "
              f"(best mega {min(tg, tgb) / min(tm, tmi):.2f}x best grid)",
              flush=True)

    r1l = np.asarray(r1[1])
    self_a = float(np.mean([len(set(x)) / 10 for x in r1l]))
    print(f"metric ceiling (grid self-agreement): {self_a:.4f}",
          flush=True)
    a = float(np.mean([len(set(x) & set(y)) / 10
                       for x, y in zip(r1l, np.asarray(r2[1]))]))
    print(f"mega vs grid label agreement: {a:.4f}", flush=True)

    if not args.flat and a < 0.9999:
        # Localize: compare the RAW (t_max, qg, lmax) score tensors of
        # the two kernels over the real-tile prefix.
        g_raw, g_tl, g_tq, g_ps = pp.pallas_ivf_sq_pairs_search(
            payload, rn, rs, counts, row_pos, vmin, scale, probe_ids,
            xq, None, interpret=interp, debug_raw=True, **kw)
        m_raw, m_tl, m_tq, m_ps = pp.pallas_ivf_sq_pairs_search(
            payload, rn, rs, counts, row_pos, vmin, scale, probe_ids,
            xq, None, mega=True, digit_dtype="bf16", interpret=interp,
            debug_raw=True, **kw, **mkw)
        g_raw, m_raw = np.asarray(g_raw), np.asarray(m_raw)
        g_tq = np.asarray(g_tq)
        nt = min(g_raw.shape[0], m_raw.shape[0])
        gr, mr = g_raw[:nt], m_raw[:nt]
        realq = (g_tq[:nt] >= 0)
        finite = np.isfinite(gr) & np.isfinite(mr)
        both = finite & realq[:, :, None]
        diff = np.where(both, np.abs(gr - mr), 0.0)
        rel = diff / np.maximum(np.abs(gr), 1.0)
        bad = rel > 1e-3
        bad_tiles = np.where(bad.any(axis=(1, 2)))[0]
        print(f"raw diff: {bad.sum()} bad cells in {len(bad_tiles)} "
              f"tiles of {nt}; max rel {rel.max():.3e}", flush=True)
        # -inf/finite mismatches
        mism = (np.isneginf(gr) != np.isneginf(mr)) & realq[:, :, None]
        print(f"neg-inf mismatches: {mism.sum()}", flush=True)

        # Host epilogue from each raw: which on-chip program lies?
        def host_labels(raw_h, ps_h, lmax_h):
            pv = (raw_h.reshape(-1, lmax_h)[np.asarray(ps_h).reshape(-1)]
                  .reshape(nq, -1))
            # pre-rerank int8-order candidates (k_scan) then host rerank
            ks = min(40, pv.shape[1])
            sel = np.argsort(-pv, axis=1)[:, :ks]
            lane_h = sel % lmax_h
            lids_h = np.take_along_axis(np.asarray(probe_ids),
                                        sel // lmax_h, axis=1)
            pos_h = np.asarray(row_pos)[lids_h, lane_h]
            crows = np.asarray(payload)[lids_h, lane_h].astype(np.float32)
            xs = crows * np.asarray(scale) + np.asarray(vmin)
            s2 = np.einsum("qd,qcd->qc", np.asarray(xq), xs)
            s2 = np.where(np.isneginf(
                np.take_along_axis(pv, sel, axis=1)), -np.inf, s2)
            sel2 = np.argsort(-s2, axis=1)[:, :10]
            return np.take_along_axis(pos_h, sel2, axis=1)

        hg = host_labels(gr, g_ps, gr.shape[2])
        hm = host_labels(mr, m_ps, mr.shape[2])
        for nm, a_, b_ in (("host(g) vs host(m)", hg, hm),
                           ("host(g) vs r1", hg, np.asarray(r1[1])),
                           ("host(m) vs r2", hm, np.asarray(r2[1]))):
            ag = float(np.mean([len(set(x) & set(y)) / 10
                                for x, y in zip(a_, b_)]))
            print(f"  {nm}: {ag:.4f}", flush=True)
        if len(bad_tiles):
            t0 = int(bad_tiles[0])
            rows = np.where(bad[t0].any(axis=1))[0]
            lanes = np.where(bad[t0].any(axis=0))[0]
            print(f"tile {t0} (list {int(np.asarray(g_tl)[t0])}): bad "
                  f"rows {rows.tolist()} lanes "
                  f"[{lanes.min()}..{lanes.max()}] n={len(lanes)}",
                  flush=True)
            print(f"  grid[t0,r0,first3lanes] "
                  f"{gr[t0, rows[0], lanes[:3]].tolist()}", flush=True)
            print(f"  mega[t0,r0,first3lanes] "
                  f"{mr[t0, rows[0], lanes[:3]].tolist()}", flush=True)
            print(f"  bad tile list ids: "
                  f"{np.asarray(g_tl)[bad_tiles[:20]].tolist()}",
                  flush=True)
            print(f"  bad tiles: {bad_tiles[:30].tolist()}", flush=True)
    print("MEGA-DEBUG COMPLETE", flush=True)


if __name__ == "__main__":
    main()
