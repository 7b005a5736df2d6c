"""Per-DMA fixed-cost probe for the hand-rolled (mega-style) list scans.

The pair-tile scan at marco is bound by ~9 us per distinct probed list
(BASELINE round-4) with BOTH the automatic-pipeline grid kernel (~7 us
per grid step, mxu_probe) and the mega kernel (tps=16 collapses step
count 16x — yet the same total).  Hypothesis: the mega kernel's wall is
the DMA ISSUE cost — 3 async copies per tile (code block + ui + rnrs),
each paying a fixed sequencer cost, so collapsing grid steps moved the
bound from step overhead to copy overhead.

This probe times mega-style kernels that differ ONLY in copies per tile:

  big      — one (L, W) u8 block copy per tile             (1 copy)
  big+1    — block + one (2, L) f32 side copy              (2 copies)
  big+2    — block + two side copies                       (3 copies, the
             real mega configuration)
  split2   — block fetched as two half-row-range copies    (2 copies,
             same bytes as `big`)

Per-DMA fixed cost = slope of time vs copies at constant bytes; the
bandwidth floor is `big` at large L*W.  If the slope is ~3 us/copy, a
fused-payload mega (rnrs folded into payload tail rows + in-kernel ui
gather from a resident query-digit table) is worth ~2x at marco.

Usage (real TPU):
  env PYTHONPATH=/root/repo:/root/.axon_site python tools/dma_probe.py \
      [--nlist 4096] [--l 2048] [--w 1536] [--tiles 4096] [--tps 16]
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--l", type=int, default=2048)
    ap.add_argument("--w", type=int, default=1536)
    ap.add_argument("--tiles", type=int, default=4096)
    ap.add_argument("--tps", type=int, default=16)
    ap.add_argument("--slots", type=int, default=3)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--modes",
                    default="big,split2,split4,split8,big+side",
                    help="comma list; 'bigf32' must run ALONE (its f32 "
                         "payload is a second 12 GiB allocation)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from duckdb_faiss_ext_tpu.utils.config import on_tpu

    interp = not on_tpu()
    NL, L, W, T, TPS, SLOTS = (args.nlist, args.l, args.w, args.tiles,
                               args.tps, args.slots)
    assert T % TPS == 0

    SEMS = 8
    modes = args.modes.split(",")
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    # payloads generated ON DEVICE: a host 12 GiB ndarray + relay upload
    # cost ~15 min and blew the probe's step timeout
    payload = payload_f32 = None
    if any(m != "bigf32" for m in modes):
        payload = jax.random.randint(key, (NL, L, W), 0, 255, jnp.int32) \
            .astype(jnp.uint8)
    if "bigf32" in modes:
        # same bytes as f32 (8,128) tiles: measures whether the u8
        # (32,128)(4,1) tiling caps DMA throughput.  Values are
        # irrelevant to DMA; generated directly so only ONE payload
        # allocation exists (a bitcast VIEW still materialises a copy).
        payload_f32 = jax.random.normal(key, (NL, L, W // 4), jnp.float32)
    side = jnp.asarray(rng.standard_normal((NL, 2, L)).astype(np.float32))
    tl = jnp.asarray(rng.integers(0, NL, (T,), np.int32))

    def make(mode: str):
        f32 = mode == "bigf32"

        def kernel(tl_ref, payload_hbm, side_hbm, out_ref, code_buf,
                   side_buf, sems):
            base = pl.program_id(0) * TPS

            def copies(slot, ti):
                lid = tl_ref[base + ti]
                cs = []
                nsplit = {"big": 1, "split2": 2, "split4": 4,
                          "split8": 8}.get(mode, 1)
                h = L // nsplit
                for j in range(nsplit):
                    cs.append(pltpu.make_async_copy(
                        payload_hbm.at[lid, pl.ds(j * h, h)],
                        code_buf.at[slot, pl.ds(j * h, h)],
                        sems.at[slot * SEMS + j]))
                if mode == "big+side":
                    # whole (2, L) side block in ONE copy (a 1-sublane
                    # f32 slice violates the (2,128) HBM tiling)
                    cs.append(pltpu.make_async_copy(
                        side_hbm.at[lid], side_buf.at[slot],
                        sems.at[slot * SEMS + 1]))
                return cs

            def start(slot, ti):
                for c in copies(slot, ti):
                    c.start()

            def wait(slot, ti):
                for c in copies(slot, ti):
                    c.wait()

            for s in range(SLOTS - 1):
                start(s, s)

            def body(ti, acc):
                slot = lax.rem(ti, SLOTS)
                nxt = ti + SLOTS - 1

                @pl.when(nxt < TPS)
                def _pre():
                    start(lax.rem(nxt, SLOTS), nxt)

                wait(slot, ti)
                # touch one row so the copies aren't dead
                if f32:
                    return acc + jnp.sum(code_buf[slot, 0])
                return acc + jnp.sum(code_buf[slot, 0]
                                     .astype(jnp.int32)).astype(jnp.float32)

            acc = lax.fori_loop(0, TPS, body,
                                jnp.zeros((128,), jnp.float32))
            out_ref[0] = jnp.broadcast_to(acc[None, :], (8, 128))

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T // TPS,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i, tl: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                (pltpu.VMEM((SLOTS, L, W // 4), jnp.float32) if f32
                 else pltpu.VMEM((SLOTS, L, W), jnp.uint8)),
                pltpu.VMEM((SLOTS, 2, L), jnp.float32),
                pltpu.SemaphoreType.DMA((SLOTS * SEMS,)),
            ],
        )
        return jax.jit(lambda tl, p, s: pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((T // TPS, 8, 128),
                                           jnp.float32),
            interpret=interp)(tl, p, s))

    gib = T * L * W / 2**30
    print(f"payload {NL}x{L}x{W} u8; "
          f"{T} tiles x {L*W/2**20:.2f} MiB = {gib:.1f} GiB read; "
          f"tps {TPS} slots {SLOTS}; modes {modes}", flush=True)
    base_ms = None
    for mode in modes:
        fn = make(mode)
        pay = payload_f32 if mode == "bigf32" else payload
        out = fn(tl, pay, side)
        np.asarray(out[0, 0])
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            np.asarray(fn(tl, pay, side)[0, 0])
            best = min(best, time.time() - t0)
        ms = best * 1e3
        bw = gib / best
        per_tile = best / T * 1e6
        extra = ""
        if mode == "big":
            base_ms = ms
        elif base_ms is not None:
            ncop = {"split2": 2, "split4": 4, "split8": 8,
                    "big+side": 2, "bigf32": 2}[mode]
            extra = (f"  (+{(ms - base_ms) / T * 1e3 / (ncop - 1):.2f} "
                     f"us/extra-copy)")
        print(f"  {mode:7s}: {ms:8.1f} ms  {bw:6.1f} GiB/s  "
              f"{per_tile:6.2f} us/tile{extra}", flush=True)


if __name__ == "__main__":
    main()
