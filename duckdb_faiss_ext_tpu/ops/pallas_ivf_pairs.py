"""Pair-tile Pallas IVF scan: MXU-batched serving for large query batches.

The per-query DMA kernel (ops/pallas_ivf.py) issues one (1, d)·(lmax, d)
dot per probed list — a batch-1 contraction that Mosaic executes on the
VPU, so big-batch serving is compute-bound at ~1/30 of the MXU rate
(measured 2026-08-19: 8.8M x 1536 IVF4096,SQ8 b1024 ≈ 1.0 s/batch against
a ~45 ms DMA floor).  Queries cannot be batched per PROGRAM because each
query probes different lists — but they can be batched per LIST:

* invert the probe map into (list, query) pairs and sort by list;
* tile each list's queries into groups of ``QG`` (pad the last tile);
* one grid step per tile: DMA the list block once (Pallas skips the
  copy when consecutive tiles map the same list — tiles are sorted, so
  hot lists and tail padding fetch once), score all QG queries with a
  single (QG, d) x (lmax, d) int8 MXU contraction, and write the raw
  (QG, lmax) score tile to HBM — an in-kernel top-k was measured
  SLOWER than the dots it saved (the serial insert passes cost ~90 us
  per tile at lmax 2560 vs ~0.1 ms of total extra HBM traffic for raw
  scores);
* outside: a static inverse-permutation row gather rebuilds
  (nq, nprobe·lmax) scores, window-max exact_topk selects k_scan per
  query, and the usual decode + fp32 rerank restores exact distances —
  the identical epilogue the per-query kernel uses.

Every (query, list) pair is scored exactly once (IVF semantics are exact:
a candidate is returned iff its list was probed), tiles of the same hot
list share one DMA per QG queries, and all shapes are static: the tile
table is built on-device from probe_ids with a worst-case tile count
``npair // QG + active-list partial tiles``.

Reference parity: this accelerates the same Index::search semantics as
faiss IndexIVF (reference delegates to the faiss submodule behind
src/faiss_extension.cpp:629-638); the batching trick itself is
TPU-specific (no reference analogue — OpenMP parallelises over queries).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flat_search import _NEG_INF, exact_topk

#: queries per tile: MXU sublane batching factor.  8 keeps padding waste
#: low at the measured ~4 queries/list occupancy (b1024, nprobe 16,
#: nlist 4096) while lifting the dot off the VPU.
QG = 8

#: scoped-VMEM budget for choosing how many tiles share a grid step.
PAIRS_WAYS_VMEM = 12 << 20


def pairs_ways(lmax: int, wbytes: int, qg: int) -> int:
    """Tiles per grid step (amortises the per-step pipeline overhead,
    like the per-query kernel's WAYS): largest of 4/2/1 whose
    double-buffered list blocks + per-way query/score tiles fit VMEM."""
    for w in (4, 2, 1):
        per_way = 2 * lmax * wbytes + 2 * qg * lmax * 4 + qg * 4 * wbytes
        if w * per_way <= PAIRS_WAYS_VMEM:
            return w
    return 1


def pairs_t_max(nq: int, nprobe: int, nlist: int, qg: int = QG) -> int:
    """Static worst-case tile count: every list's pairs fill
    ``floor(npair/qg)`` whole tiles at most, plus at most one partial
    tile per active list."""
    npair = nq * nprobe
    return npair // qg + min(nlist, npair)


@functools.partial(jax.jit, static_argnames=("nlist", "t_max", "qg"))
def build_pair_tiles(probe_ids, *, nlist: int, t_max: int, qg: int = QG):
    """Invert (nq, nprobe) probe ids into per-list query tiles.

    Returns (tile_list (t_max,) int32 — list id per tile, 0 for padding;
    tile_q (t_max, qg) int32 — query ids, -1 for empty slots;
    pair_slot (nq, nprobe) int32 — flat (tile*qg + slot) output index of
    each original pair; n_tiles () int32 — count of real tiles, so the
    kernel can skip the dots on padding tiles, whose output rows no
    pair_slot ever reads).  Pure static-shape XLA (sorts + scatters)."""
    nq, nprobe = probe_ids.shape
    npair = nq * nprobe
    lists = probe_ids.reshape(-1).astype(jnp.int32)
    qid = (jnp.arange(npair, dtype=jnp.int32) // nprobe)
    order = jnp.argsort(lists, stable=True)
    sl = lists[order]
    sq = qid[order]
    m = jnp.zeros((nlist,), jnp.int32).at[lists].add(1)
    tiles_pl = (m + qg - 1) // qg
    start_tile = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(tiles_pl)[:-1]])
    first_idx = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(m)[:-1]])
    r = jnp.arange(npair, dtype=jnp.int32) - first_idx[sl]
    tile = start_tile[sl] + r // qg
    slot = r % qg
    tile_q = jnp.full((t_max, qg), -1, jnp.int32).at[tile, slot].set(sq)
    tile_list = jnp.zeros((t_max,), jnp.int32).at[tile].set(sl)
    pair_slot = (jnp.zeros((npair,), jnp.int32)
                 .at[order].set(tile * qg + slot).reshape(nq, nprobe))
    return tile_list, tile_q, pair_slot, jnp.sum(tiles_pl)


@functools.partial(jax.jit, static_argnames=("nlist", "qcap"))
def build_sweep_tiles(probe_ids, *, nlist: int, qcap: int):
    """Full-sweep tile table: tile i IS list i (static payload index map
    — the DMA pipeline prefetches perfectly, unlike the pair tiles'
    scalar-prefetch-driven maps).  Each list's probing queries fill its
    ``qcap`` slots by rank; the CALLER guarantees max probers <= qcap
    (host bincount gate in models/ivf_serve.py).

    Returns (tile_q (nlist, qcap) int32 query ids (-1 empty),
    pair_slot (nq, nprobe) int32 flat (list*qcap + slot) index)."""
    nq, nprobe = probe_ids.shape
    npair = nq * nprobe
    lists = probe_ids.reshape(-1).astype(jnp.int32)
    qid = jnp.arange(npair, dtype=jnp.int32) // nprobe
    order = jnp.argsort(lists, stable=True)
    sl = lists[order]
    sq = qid[order]
    m = jnp.zeros((nlist,), jnp.int32).at[lists].add(1)
    first_idx = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(m)[:-1]])
    r = jnp.arange(npair, dtype=jnp.int32) - first_idx[sl]
    tile_q = jnp.full((nlist, qcap), -1, jnp.int32).at[sl, r].set(sq)
    pair_slot = (jnp.zeros((npair,), jnp.int32)
                 .at[order].set(sl * qcap + r).reshape(nq, nprobe))
    return tile_q, pair_slot


def _pairs_sq_kernel(meta_ref, counts_ref, ui_ref, qs_ref, *rest,
                     metric: str, codec: str, has_mask: bool, ways: int,
                     qg: int, digit_dtype: str = "int8"):
    """meta_ref: (1 + t_pad,) int32 prefetch — [0] = count of real tiles,
    [1:] = list id per tile.  ``ways`` tiles are scored per grid step
    (separate in_specs alias the payload with staggered index maps, the
    per-query kernel's WAYS pattern) and the dots are predicated off on
    padding tiles — their output rows are never gathered by pair_slot,
    and at the marco shape (b1024, nprobe 16, nlist 4096) ~20% of t_max
    is padding that used to pay full MXU ingest."""
    codes_refs = rest[:ways]
    rn_refs = rest[ways:2 * ways]
    rs_refs = rest[2 * ways:3 * ways]
    if has_mask:
        mask_refs = rest[3 * ways:4 * ways]
        out_ref = rest[4 * ways]
    else:
        mask_refs = None
        out_ref = rest[3 * ways]

    from .sq_digits import sq_block_digit_dot, sq_utile

    t = pl.program_id(0)
    n_tiles = meta_ref[0]
    sim = metric == "INNER_PRODUCT"

    for w in range(ways):
        gt = t * ways + w
        lid = meta_ref[1 + gt]
        cnt = counts_ref[lid]
        ui = ui_ref[w]                                # (qg, 2*wq) int8
        wq = ui.shape[1] // 2
        su2 = qs_ref[w, :, 0]                         # (qg,)
        c0 = qs_ref[w, :, 1]
        base = qs_ref[w, :, 2]                        # ±inf on empty slots
        mu = qs_ref[w, :, 3]
        block = codes_refs[w][0]                      # (lmax, wb) uint8
        lmax = (block.shape[0] // 3 if codec == "sq6"
                else block.shape[0])                  # sq6: (3*lmax, d4)
        wb = 3 * block.shape[1] if codec == "sq6" else block.shape[1]
        utile = sq_utile(codec, lmax, wb,
                         2 * ways * lmax * wb + ways * qg * lmax * 8,
                         dtype=digit_dtype)
        rs_row = rs_refs[w][0, 0]                     # (lmax,)
        rn_row = None if sim else rn_refs[w][0, 0]
        mask_row = mask_refs[w][0, 0] if has_mask else None

        @pl.when(gt < n_tiles)
        def _score(ui=ui, su2=su2, c0=c0, base=base, mu=mu, block=block,
                   rs_row=rs_row, rn_row=rn_row, mask_row=mask_row,
                   cnt=cnt, w=w, wq=wq, lmax=lmax, utile=utile):
            hi_q = lax.slice(ui, (0, 0), (qg, wq))
            lo_q = lax.slice(ui, (0, wq), (qg, 2 * wq))
            # Stack hi|lo along M: ONE (2*qg, wq) dot per sub-tile
            # instead of two (qg, wq) dots — doubles the MXU M fill
            # (int8 native tile is (32, 128); qg=8 alone fills 8 rows).
            ug2 = jnp.concatenate([hi_q, lo_q], axis=0)
            d_parts = []
            for t0 in range(0, lmax, utile):
                ut = min(utile, lmax - t0)   # adaptive utile (sq8) may
                dot = sq_block_digit_dot(block, t0, ut, codec,  # not divide
                                         dtype=digit_dtype)
                d_parts.append(dot(ug2))
            dot2 = (d_parts[0] if len(d_parts) == 1
                    else jnp.concatenate(d_parts, axis=1))
            dot_hi = lax.slice(dot2, (0, 0), (qg, lmax))
            dot_lo = lax.slice(dot2, (qg, 0), (2 * qg, lmax))
            utc = su2[:, None] * (128.0 * dot_hi.astype(jnp.float32)
                                  + dot_lo.astype(jnp.float32))
            uc = utc + c0[:, None] + mu[:, None] * rs_row[None, :]
            if sim:
                score = base[:, None] + uc            # -inf rows stay -inf
            else:
                score = -jnp.maximum(
                    base[:, None] - 2.0 * uc + rn_row[None, :], 0.0)
            lane = lax.broadcasted_iota(jnp.int32, (qg, lmax), 1)
            valid = lane < cnt
            if has_mask:
                valid = jnp.logical_and(valid, mask_row[None, :] != 0)
            out_ref[w] = jnp.where(valid, score, _NEG_INF)


@functools.partial(
    jax.jit,
    static_argnames=("k", "k_scan", "nprobe", "metric", "codec",
                     "interpret", "qg", "ways_opt", "sweep",
                     "digit_dtype", "mega", "tps_opt", "slots_opt",
                     "mega_skip_pad", "debug_raw", "utile_opt"),
)
def pallas_ivf_sq_pairs_search(
    codes_lists,   # (nlist, lmax, w) uint8 / (nlist, 3*lmax, d4) sq6
    row_norm,      # (nlist, lmax) fp32
    row_sum,       # (nlist, lmax) fp32
    counts,        # (nlist,) int32
    row_pos,       # (nlist, lmax) int32
    vmin,          # (d,) fp32
    scale,         # (d,) fp32
    probe_ids,     # (nq, nprobe) int32
    xq,            # (nq, d) fp32
    mask,          # (nlist, lmax) int8 or None
    *,
    k: int,
    k_scan: int,
    nprobe: int,
    metric: str,
    codec: str = "sq8",
    interpret: bool = False,
    qg: int = QG,
    ways_opt: int | None = None,
    sweep: bool = False,
    digit_dtype: str = "int8",
    mega: bool = False,
    tps_opt: int | None = None,
    slots_opt: int | None = None,
    mega_skip_pad: bool = True,
    debug_raw: bool = False,
    utile_opt: int | None = None,
):
    """MXU-batched IVF-SQ list scan (see module docstring).  Same output
    conventions as pallas_ivf_sq_search: (scores (nq, k) max-oriented
    fp32-exact after rerank, positions (nq, k) int32, -1 missing).

    ``sweep=True``: full-corpus static sweep — one tile per LIST in
    index order (tile i = list i, payload index map static in the grid
    index, so the DMA stream prefetches with no scalar dependence),
    with each list's probing queries in its ``qg`` slots.  The right
    regime is large batches where most lists are probed anyway (b1024
    nprobe=16 over nlist=4096 probes ~98% of lists): the pair-tile
    path's ~4000 data-dependent partial tiles measured ~75 us of
    per-tile stall (308 ms vs a ~16 ms HBM floor, 2026-08-20); the
    sweep replaces them with nlist statically-pipelined steps.  Caller
    guarantees max probers per list <= qg (models/ivf_serve.py host
    bincount gate)."""
    from .sq import SQ_INT8_SHIFT, sq_query_digits

    if codec == "sq6":
        nlist, l3, d4 = codes_lists.shape        # plane-major (3*lmax, d4)
        lmax = l3 // 3
        wbytes = 3 * d4
    else:
        nlist, lmax, wbytes = codes_lists.shape
    d = vmin.shape[0]
    nq = xq.shape[0]
    has_mask = mask is not None
    sim = metric == "INNER_PRODUCT"
    ways = ways_opt or pairs_ways(lmax, wbytes, qg)

    if sim:
        u = xq * scale[None, :]
        base = xq @ vmin
    else:
        t = xq - vmin[None, :]
        u = t * scale[None, :]
        base = jnp.sum(t * t, axis=1)
    hi, lo, su2, mu, sum_ut = sq_query_digits(u)
    shift = float(SQ_INT8_SHIFT[codec])
    c0 = (shift * sum_ut if codec == "sq8"
          else jnp.zeros_like(su2))

    from .sq_digits import sq_pack_query_planes

    ui_pack = jnp.concatenate(
        [sq_pack_query_planes(hi, d, wbytes, codec),
         sq_pack_query_planes(lo, d, wbytes, codec)], axis=1)
    wq = ui_pack.shape[1] // 2                        # (nq, 2*wq) int8
    qscal = jnp.stack([su2, c0, base, mu], axis=1)    # (nq, 4) fp32

    # Tile table + per-tile gathered query operands.
    if sweep:
        while nlist % ways:
            ways //= 2
        t_max = nlist
        tile_q, pair_slot = build_sweep_tiles(
            probe_ids.astype(jnp.int32), nlist=nlist, qcap=qg)
        tile_list = jnp.arange(nlist, dtype=jnp.int32)
        meta = jnp.concatenate([jnp.full((1,), nlist, jnp.int32),
                                tile_list])
    else:
        t_max = pairs_t_max(nq, nprobe, nlist, qg)
        blk = lmax * wbytes                  # sq6: 3*lmax*d4 == lmax*wbytes
        if mega:
            # tiles per mega step / in-flight slots, VMEM-fitted: slots
            # of (code + ui + rnrs) buffers + the double-buffered
            # (tps, qg, lmax) fp32 out window.
            nrl = 2 + int(has_mask)
            blk_s = blk + qg * 2 * wq + nrl * lmax * 4
            slots = slots_opt or (3 if 3 * blk_s <= (9 << 20) else 2)
            tps = tps_opt or 16
            while tps_opt is None and tps > 4 and \
                    slots * blk_s + 2 * tps * qg * lmax * 4 > (13 << 20):
                tps //= 2
            # t_max must be a 128-multiple for _lane_pick's aligned
            # window (tps is a pow2 <= 128, so 128 | t_max => tps | t_max)
            round_to = 128
        else:
            round_to = ways
        t_max = -(-t_max // round_to) * round_to
        tile_list, tile_q, pair_slot, n_tiles = build_pair_tiles(
            probe_ids.astype(jnp.int32), nlist=nlist, t_max=t_max, qg=qg)
        meta = jnp.concatenate([n_tiles[None].astype(jnp.int32),
                                tile_list])
    safe_q = jnp.maximum(tile_q, 0)
    ui_t = ui_pack[safe_q]                            # (t_max, qg, 2*wq)
    qs_t = qscal[safe_q]                              # (t_max, qg, 4)
    # Empty slots score -inf via base: IP adds base directly; L2 negates
    # a max() with base inside, so +inf there also yields -inf.
    dead = jnp.inf if not sim else -jnp.inf
    qs_t = qs_t.at[:, :, 2].set(
        jnp.where(tile_q < 0, dead, qs_t[:, :, 2]))

    if mega and not sweep:
        rlanes = [row_norm, row_sum]
        if has_mask:
            rlanes.append(mask.reshape(nlist, lmax).astype(jnp.float32))
        rnrs = jnp.stack(rlanes, axis=1)          # (nlist, C, lmax) f32
        code_shape = ((slots, 3 * lmax, (d + 3) // 4) if codec == "sq6"
                      else (slots, lmax, wbytes))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(t_max // tps,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((4, qg, t_max),
                             lambda i, tl, cn: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((tps, qg, lmax),
                                   lambda i, tl, cn: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM(code_shape, jnp.uint8),
                pltpu.VMEM((slots, qg, ui_t.shape[2]), jnp.int8),
                pltpu.VMEM((slots, len(rlanes), lmax), jnp.float32),
                pltpu.SemaphoreType.DMA((slots * 3,)),
            ],
        )
        kernel = functools.partial(
            _pairs_sq_mega_kernel, metric=metric, codec=codec,
            has_mask=has_mask, qg=qg, tps=tps, slots=slots,
            digit_dtype=digit_dtype, skip_pad=mega_skip_pad,
            utile_opt=utile_opt)
        raw = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((t_max, qg, lmax),
                                           jnp.float32),
            interpret=interpret,
        )(meta, counts.astype(jnp.int32), ui_t,
          jnp.transpose(qs_t, (2, 1, 0)), codes_lists, rnrs)
        if debug_raw:
            return raw, tile_list, tile_q, pair_slot

        from .pallas_ivf import sq_exact_rerank

        pv = (raw.reshape(t_max * qg, lmax)[pair_slot.reshape(-1)]
              .reshape(nq, nprobe * lmax))
        k_scan = min(k_scan, nprobe * lmax)
        best, sel = exact_topk(pv, k_scan)
        safe_lane = sel % lmax
        lids = jnp.take_along_axis(probe_ids, sel // lmax, axis=1)
        pos = row_pos[lids, safe_lane]
        return sq_exact_rerank(codes_lists, lids, safe_lane, pos, best,
                               xq, vmin, scale, codec=codec, k=k,
                               metric=metric)

    def lspec(w):
        if sweep:
            # static in the grid index: the payload DMA stream has no
            # scalar-prefetch dependence and double-buffers cleanly.
            if codec == "sq6":
                return pl.BlockSpec(
                    (1, 3 * lmax, d4),
                    lambda i, tl, cn, w=w: (i * ways + w, 0, 0),
                    memory_space=pltpu.VMEM)
            return pl.BlockSpec(
                (1, lmax, wbytes),
                lambda i, tl, cn, w=w: (i * ways + w, 0, 0),
                memory_space=pltpu.VMEM)
        if codec == "sq6":
            return pl.BlockSpec(
                (1, 3 * lmax, d4),
                lambda i, tl, cn, w=w: (tl[1 + i * ways + w], 0, 0),
                memory_space=pltpu.VMEM)
        return pl.BlockSpec(
            (1, lmax, wbytes),
            lambda i, tl, cn, w=w: (tl[1 + i * ways + w], 0, 0),
            memory_space=pltpu.VMEM)

    def lanespec(w):
        if sweep:
            return pl.BlockSpec(
                (1, 1, lmax),
                lambda i, tl, cn, w=w: (i * ways + w, 0, 0),
                memory_space=pltpu.VMEM)
        return pl.BlockSpec(
            (1, 1, lmax),
            lambda i, tl, cn, w=w: (tl[1 + i * ways + w], 0, 0),
            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((ways, qg, 2 * wq), lambda i, tl, cn: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ways, qg, 4), lambda i, tl, cn: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [meta, counts.astype(jnp.int32), ui_t, qs_t]
    in_specs += [lspec(w) for w in range(ways)]
    args += [codes_lists] * ways
    in_specs += [lanespec(w) for w in range(ways)]
    args += [row_norm.reshape(nlist, 1, lmax)] * ways
    in_specs += [lanespec(w) for w in range(ways)]
    args += [row_sum.reshape(nlist, 1, lmax)] * ways
    if has_mask:
        in_specs += [lanespec(w) for w in range(ways)]
        args += [mask.reshape(nlist, 1, lmax)] * ways

    kernel = functools.partial(_pairs_sq_kernel, metric=metric,
                               codec=codec, has_mask=has_mask, ways=ways,
                               qg=qg, digit_dtype=digit_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_max // ways,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((ways, qg, lmax),
                               lambda i, tl, cn: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    raw = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_max, qg, lmax), jnp.float32),
        interpret=interpret,
    )(*args)
    if debug_raw:
        return raw, tile_list, tile_q, pair_slot

    # Static inverse ROW gather: every original (query, probe) pair owns
    # one (tile, slot) score row; then the per-query kernel's epilogue.
    from .pallas_ivf import sq_exact_rerank

    pv = (raw.reshape(t_max * qg, lmax)[pair_slot.reshape(-1)]
          .reshape(nq, nprobe * lmax))
    k_scan = min(k_scan, nprobe * lmax)
    best, sel = exact_topk(pv, k_scan)
    safe_lane = sel % lmax
    lids = jnp.take_along_axis(probe_ids, sel // lmax, axis=1)
    pos = row_pos[lids, safe_lane]
    return sq_exact_rerank(codes_lists, lids, safe_lane, pos, best, xq,
                           vmin, scale, codec=codec, k=k, metric=metric)


def _lane_pick(qs_ref, gt):
    """Read lane ``gt`` of a (S, qg, t_max) fp32 resident table.  Mosaic
    requires dynamic LANE indices to be provably 128-aligned, so read
    the aligned 128-lane window containing ``gt`` (pl.multiple_of hint)
    and mask-reduce the wanted lane (t_max is rounded to 128 by the
    caller so the window never overruns)."""
    rem = lax.rem(gt, 128)
    g0 = pl.multiple_of(gt - rem, 128)
    win = qs_ref[:, :, pl.ds(g0, 128)]              # (S, qg, 128)
    lane = lax.broadcasted_iota(jnp.int32, win.shape, 2)
    return jnp.sum(jnp.where(lane == rem, win, 0.0), axis=2)


def _pairs_sq_mega_kernel(meta_ref, counts_ref, ui_hbm, qs_ref,
                          payload_hbm, rnrs_hbm, out_ref,
                          code_buf, ui_buf, rnrs_buf, sems, *,
                          metric: str, codec: str, has_mask: bool,
                          qg: int, tps: int, slots: int,
                          digit_dtype: str, skip_pad: bool = True,
                          utile_opt: int | None = None):
    """Mega-step variant of the pair-tile scan: ONE grid step processes
    ``tps`` tiles with hand-rolled async copies over ``slots`` VMEM
    buffers.  Motivation (mxu_probe, 2026-08-20): the automatic-pipeline
    kernel pays ~12.5 us PER GRID STEP even for a no-op body — ~4000
    tile-steps made the 8.8M x 1536 b1024 scan ~50 ms against a ~10 ms
    floor.  Here the per-tile cost is one semaphore wait + four DMA
    starts, and copies for ``slots-1`` tiles stay in flight.

    Layouts: ui (t_max, qg, 2wq) int8 (per-tile gathered query digits,
    DMA'd per tile), qs (4, qg, t_max) fp32 resident WHOLE in VMEM —
    the TILE axis must be the LANE axis: a (t_max, qg, 4) layout pads
    its 4-lane minor dim to 128 (32x inflation, 25.2 MB at the marco
    t_max 6144 — the round-3 scoped-VMEM stack OOM), while (4, qg,
    t_max) is exactly 786 KB.  payload (nlist, lmax, w) u8 (sq6:
    (nlist, 3*lmax, d4)), rnrs (nlist, C, lmax) fp32 with C = 2 + mask
    (row_norm, row_sum, and the selector mask widened to fp32 so one
    DMA fetches all per-row lanes)."""
    from .sq_digits import sq_block_digit_dot, sq_utile

    t_sup = pl.program_id(0)
    base = t_sup * tps
    n_tiles = meta_ref[0]
    sim = metric == "INNER_PRODUCT"

    def tile_copies(slot, ti):
        gt = base + ti
        lid = meta_ref[1 + gt]
        return (
            pltpu.make_async_copy(payload_hbm.at[lid],
                                  code_buf.at[slot],
                                  sems.at[slot * 3]),
            pltpu.make_async_copy(ui_hbm.at[gt],
                                  ui_buf.at[slot],
                                  sems.at[slot * 3 + 1]),
            pltpu.make_async_copy(rnrs_hbm.at[lid],
                                  rnrs_buf.at[slot],
                                  sems.at[slot * 3 + 2]),
        )

    def start(slot, ti):
        # Padding tiles (>= n_tiles) never compute and their output is
        # never gathered — skip their copies entirely (at the marco
        # shape ~2000 padding tiles would otherwise re-DMA list 0's
        # 3 MB block each).  wait() predicates identically, so
        # semaphore signals and waits stay paired.  skip_pad=False is
        # the bisect knob (tools/mega_debug.py): copy unconditionally.
        if not skip_pad:
            for c in tile_copies(slot, ti):
                c.start()
            return

        @pl.when(base + ti < n_tiles)
        def _go():
            for c in tile_copies(slot, ti):
                c.start()

    def wait(slot, ti):
        if not skip_pad:
            for c in tile_copies(slot, ti):
                c.wait()
            return

        @pl.when(base + ti < n_tiles)
        def _go():
            for c in tile_copies(slot, ti):
                c.wait()

    for s in range(slots - 1):          # warmup: slots-1 tiles in flight
        start(s, s)

    if codec == "sq6":
        lmax = code_buf.shape[1] // 3        # (slots, 3*lmax, d4)
        wb = 3 * code_buf.shape[2]
    else:
        lmax = code_buf.shape[1]
        wb = code_buf.shape[2]
    # Full resident-VMEM accounting for the digit-dot sub-tile budget
    # (an under-count here over-sizes utile and blows scoped VMEM — the
    # round-3 failure mode): code slots + ui slots + rnrs slots + the
    # double-buffered out window + the whole-resident qs table.
    resident = (slots * (lmax * wb + qg * ui_buf.shape[2]
                         + rnrs_buf.shape[1] * lmax * 4)
                + 2 * tps * qg * lmax * 4
                + qs_ref.shape[0] * qg * 16)
    utile = utile_opt or sq_utile(codec, lmax, wb, resident,
                                  dtype=digit_dtype)

    def body(ti, _):
        slot = lax.rem(ti, slots)
        nxt = ti + slots - 1

        @pl.when(nxt < tps)
        def _prefetch():
            start(lax.rem(nxt, slots), nxt)

        wait(slot, ti)
        gt = base + ti

        @pl.when(gt < n_tiles)
        def _score():
            block = code_buf[slot]
            ui = ui_buf[slot]                       # (qg, 2*wq) int8
            qsv = _lane_pick(qs_ref, gt)            # (4, qg) fp32
            rv = rnrs_buf[slot]                     # (C, lmax) fp32
            wq = ui.shape[1] // 2
            su2 = qsv[0]
            c0 = qsv[1]
            base_q = qsv[2]
            mu = qsv[3]
            rn_row = rv[0]
            rs_row = rv[1]
            cnt = counts_ref[meta_ref[1 + gt]]
            hi_q = lax.slice(ui, (0, 0), (qg, wq))
            lo_q = lax.slice(ui, (0, wq), (qg, 2 * wq))
            ug2 = jnp.concatenate([hi_q, lo_q], axis=0)
            d_parts = []
            for t0 in range(0, lmax, utile):
                ut = min(utile, lmax - t0)
                dot = sq_block_digit_dot(block, t0, ut, codec,
                                         dtype=digit_dtype)
                d_parts.append(dot(ug2))
            dot2 = (d_parts[0] if len(d_parts) == 1
                    else jnp.concatenate(d_parts, axis=1))
            dot_hi = lax.slice(dot2, (0, 0), (qg, lmax))
            dot_lo = lax.slice(dot2, (qg, 0), (2 * qg, lmax))
            utc = su2[:, None] * (128.0 * dot_hi.astype(jnp.float32)
                                  + dot_lo.astype(jnp.float32))
            uc = utc + c0[:, None] + mu[:, None] * rs_row[None, :]
            if sim:
                score = base_q[:, None] + uc
            else:
                score = -jnp.maximum(
                    base_q[:, None] - 2.0 * uc + rn_row[None, :], 0.0)
            lane = lax.broadcasted_iota(jnp.int32, (qg, lmax), 1)
            valid = lane < cnt
            if has_mask:
                valid = jnp.logical_and(valid, rv[2][None, :] != 0.0)
            out_ref[pl.ds(ti, 1)] = \
                jnp.where(valid, score, _NEG_INF)[None]

        return 0

    lax.fori_loop(0, tps, body, 0)


def _pairs_flat_mega_kernel(meta_ref, counts_ref, xq_hbm, qs_ref,
                            payload_hbm, *rest, metric: str,
                            has_mask: bool, precision, qg: int, tps: int,
                            slots: int):
    """Mega-step variant of the flat pair-tile scan (see
    _pairs_sq_mega_kernel for the motivation: ~12.5 us per automatic
    grid step).  qs stays whole in VMEM like the SQ variant."""
    if has_mask:
        maskf_hbm = rest[0]
        out_ref, code_buf, xq_buf, mask_buf, sems = rest[1:]
    else:
        maskf_hbm = mask_buf = None
        out_ref, code_buf, xq_buf, sems = rest

    t_sup = pl.program_id(0)
    base = t_sup * tps
    n_tiles = meta_ref[0]
    sim = metric == "INNER_PRODUCT"
    lmax = code_buf.shape[1]

    def tile_copies(slot, ti):
        gt = base + ti
        lid = meta_ref[1 + gt]
        cps = [
            pltpu.make_async_copy(payload_hbm.at[lid],
                                  code_buf.at[slot],
                                  sems.at[slot * 3]),
            pltpu.make_async_copy(xq_hbm.at[gt],
                                  xq_buf.at[slot],
                                  sems.at[slot * 3 + 1]),
        ]
        if has_mask:
            cps.append(pltpu.make_async_copy(
                maskf_hbm.at[lid], mask_buf.at[slot],
                sems.at[slot * 3 + 2]))
        return cps

    def start(slot, ti):
        @pl.when(base + ti < n_tiles)   # padding tiles: no copy at all
        def _go():
            for c in tile_copies(slot, ti):
                c.start()

    def wait(slot, ti):
        @pl.when(base + ti < n_tiles)
        def _go():
            for c in tile_copies(slot, ti):
                c.wait()

    for s in range(slots - 1):
        start(s, s)

    def body(ti, _):
        slot = lax.rem(ti, slots)
        nxt = ti + slots - 1

        @pl.when(nxt < tps)
        def _prefetch():
            start(lax.rem(nxt, slots), nxt)

        wait(slot, ti)
        gt = base + ti

        @pl.when(gt < n_tiles)
        def _score():
            q = xq_buf[slot]                          # (qg, d) fp32
            qsv = _lane_pick(qs_ref, gt)              # (4, qg): tile axis
            bias = qsv[0]                             # on lanes (see SQ
            qn = qsv[1]                               # mega docstring)
            block = code_buf[slot]                    # (lmax, d) fp32
            cnt = counts_ref[meta_ref[1 + gt]]
            xy = jax.lax.dot_general(q, block, (((1,), (1,)), ((), ())),
                                     precision=precision,
                                     preferred_element_type=jnp.float32)
            if sim:
                score = xy + bias[:, None]
            else:
                bn = jnp.sum(block * block, axis=1)[None, :]
                score = -jnp.maximum(qn[:, None] - 2.0 * xy + bn, 0.0) \
                    + bias[:, None]
            lane = lax.broadcasted_iota(jnp.int32, (qg, lmax), 1)
            valid = lane < cnt
            if has_mask:
                valid = jnp.logical_and(
                    valid, mask_buf[slot][0][None, :] != 0.0)
            out_ref[pl.ds(ti, 1)] = \
                jnp.where(valid, score, _NEG_INF)[None]

        return 0

    lax.fori_loop(0, tps, body, 0)


def _pairs_flat_kernel(meta_ref, counts_ref, xq_ref, qs_ref, *rest,
                       metric: str, has_mask: bool, precision, ways: int,
                       qg: int):
    codes_refs = rest[:ways]
    if has_mask:
        mask_refs = rest[ways:2 * ways]
        out_ref = rest[2 * ways]
    else:
        mask_refs = None
        out_ref = rest[ways]

    t = pl.program_id(0)
    n_tiles = meta_ref[0]
    for w in range(ways):
        gt = t * ways + w
        lid = meta_ref[1 + gt]
        cnt = counts_ref[lid]
        q = xq_ref[w]                                 # (qg, d) fp32
        bias = qs_ref[w, :, 0]                        # -inf on dead slots
        qn = qs_ref[w, :, 1]
        block = codes_refs[w][0]                      # (lmax, d) fp32
        lmax = block.shape[0]
        mask_row = mask_refs[w][0, 0] if has_mask else None

        @pl.when(gt < n_tiles)
        def _score(q=q, bias=bias, qn=qn, block=block, mask_row=mask_row,
                   cnt=cnt, w=w, lmax=lmax):
            xy = jax.lax.dot_general(q, block, (((1,), (1,)), ((), ())),
                                     precision=precision,
                                     preferred_element_type=jnp.float32)
            if metric == "INNER_PRODUCT":
                score = xy + bias[:, None]
            else:
                bn = jnp.sum(block * block, axis=1)[None, :]
                score = -jnp.maximum(qn[:, None] - 2.0 * xy + bn, 0.0) \
                    + bias[:, None]
            lane = lax.broadcasted_iota(jnp.int32, (qg, lmax), 1)
            valid = lane < cnt
            if has_mask:
                valid = jnp.logical_and(valid, mask_row[None, :] != 0)
            out_ref[w] = jnp.where(valid, score, _NEG_INF)


@functools.partial(
    jax.jit,
    static_argnames=("k", "k_scan", "nprobe", "metric", "interpret", "qg",
                     "ways_opt", "mega"),
)
def pallas_ivf_pairs_search(
    xb_lists,      # (nlist, lmax, d) fp32 padded per list
    counts,        # (nlist,) int32
    row_pos,       # (nlist, lmax) int32
    probe_ids,     # (nq, nprobe) int32
    xq,            # (nq, d) fp32
    mask,          # (nlist, lmax) int8 or None
    *,
    k: int,
    k_scan: int,
    nprobe: int,
    metric: str,
    interpret: bool = False,
    qg: int = QG,
    ways_opt: int | None = None,
    mega: bool = False,
):
    """MXU-batched IVF,Flat list scan (pair tiles, see module docstring).
    Session-precision dots in-kernel + fp32 rerank of the k_scan
    selection outside; same output conventions as pallas_ivf_search."""
    from ..utils.config import config

    nlist, lmax, d = xb_lists.shape
    nq = xq.shape[0]
    has_mask = mask is not None
    sim = metric == "INNER_PRODUCT"
    ways = ways_opt or pairs_ways(lmax, d * 4, qg)

    t_max = pairs_t_max(nq, nprobe, nlist, qg)
    blk = lmax * d * 4
    if mega and 2 * (blk + qg * d * 4) + 2 * 4 * qg * lmax * 4 > (13 << 20):
        # fp32 list blocks too big for even 2 slots + a 4-tile out
        # window (at d=1536/lmax=4096 one block is 25 MB — the round-3
        # flat_ab 48.39M scoped-VMEM failure): fall back to the grid
        # kernel rather than fail to compile.
        mega = False
    if mega:
        slots = 3 if 3 * blk <= (9 << 20) else 2
        tps = 16
        while tps < 64 and \
                slots * blk + 2 * tps * qg * lmax * 4 <= (10 << 20):
            tps *= 2
        while tps > 4 and slots * blk + tps * qg * lmax * 4 > (13 << 20):
            tps //= 2
        round_to = 128       # 128 | t_max for _lane_pick (tps | 128)
    else:
        round_to = ways
    t_max = -(-t_max // round_to) * round_to
    tile_list, tile_q, pair_slot, n_tiles = build_pair_tiles(
        probe_ids.astype(jnp.int32), nlist=nlist, t_max=t_max, qg=qg)
    meta = jnp.concatenate([n_tiles[None].astype(jnp.int32), tile_list])
    safe_q = jnp.maximum(tile_q, 0)
    xq_t = xq[safe_q]                                 # (t_max, qg, d)
    qn = jnp.sum(xq * xq, axis=1)
    qs_t = jnp.stack(
        [jnp.where(tile_q < 0, -jnp.inf, 0.0),
         qn[safe_q], jnp.zeros_like(safe_q, jnp.float32),
         jnp.zeros_like(safe_q, jnp.float32)], axis=2)  # (t_max, qg, 4)

    if mega:
        scratch = [
            pltpu.VMEM((slots, lmax, d), jnp.float32),
            pltpu.VMEM((slots, qg, d), jnp.float32),
        ]
        margs = [meta, counts.astype(jnp.int32), xq_t,
                 jnp.transpose(qs_t, (2, 1, 0)), xb_lists]
        in_specs_m = [
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((4, qg, t_max), lambda i, tl, cn: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ]
        if has_mask:
            scratch.append(pltpu.VMEM((slots, 1, lmax), jnp.float32))
            margs.append(mask.reshape(nlist, 1, lmax)
                         .astype(jnp.float32))
            in_specs_m.append(pl.BlockSpec(memory_space=pltpu.ANY))
        scratch.append(pltpu.SemaphoreType.DMA((slots * 3,)))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(t_max // tps,),
            in_specs=in_specs_m,
            out_specs=pl.BlockSpec((tps, qg, lmax),
                                   lambda i, tl, cn: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        )
        kernel = functools.partial(
            _pairs_flat_mega_kernel, metric=metric, has_mask=has_mask,
            precision=config.precision, qg=qg, tps=tps, slots=slots)
        raw = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((t_max, qg, lmax),
                                           jnp.float32),
            interpret=interpret,
        )(*margs)
        return _pairs_flat_epilogue(raw, xb_lists, pair_slot, probe_ids,
                                    row_pos, xq, t_max=t_max, qg=qg,
                                    lmax=lmax, nq=nq, nprobe=nprobe,
                                    k=k, k_scan=k_scan, metric=metric)

    in_specs = [
        pl.BlockSpec((ways, qg, d), lambda i, tl, cn: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ways, qg, 4), lambda i, tl, cn: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [meta, counts.astype(jnp.int32), xq_t, qs_t]
    in_specs += [
        pl.BlockSpec((1, lmax, d),
                     lambda i, tl, cn, w=w: (tl[1 + i * ways + w], 0, 0),
                     memory_space=pltpu.VMEM)
        for w in range(ways)]
    args += [xb_lists] * ways
    if has_mask:
        in_specs += [
            pl.BlockSpec((1, 1, lmax),
                         lambda i, tl, cn, w=w: (tl[1 + i * ways + w], 0, 0),
                         memory_space=pltpu.VMEM)
            for w in range(ways)]
        args += [mask.reshape(nlist, 1, lmax)] * ways

    kernel = functools.partial(_pairs_flat_kernel, metric=metric,
                               has_mask=has_mask,
                               precision=config.precision, ways=ways,
                               qg=qg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_max // ways,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((ways, qg, lmax),
                               lambda i, tl, cn: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    raw = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_max, qg, lmax), jnp.float32),
        interpret=interpret,
    )(*args)
    return _pairs_flat_epilogue(raw, xb_lists, pair_slot, probe_ids,
                                row_pos, xq, t_max=t_max, qg=qg,
                                lmax=lmax, nq=nq, nprobe=nprobe,
                                k=k, k_scan=k_scan, metric=metric)


def _pairs_flat_epilogue(raw, xb_lists, pair_slot, probe_ids, row_pos,
                         xq, *, t_max, qg, lmax, nq, nprobe, k, k_scan,
                         metric):
    """Shared tail of the flat pair-tile paths: inverse pair gather,
    window-max exact top-k_scan, fp32 rerank of the selection (kernel
    dots ran at session precision)."""
    sim = metric == "INNER_PRODUCT"
    pv = (raw.reshape(t_max * qg, lmax)[pair_slot.reshape(-1)]
          .reshape(nq, nprobe * lmax))
    k_scan = min(k_scan, nprobe * lmax)
    best, sel = exact_topk(pv, k_scan)
    safe_lane = sel % lmax
    lids = jnp.take_along_axis(probe_ids, sel // lmax, axis=1)
    pos = row_pos[lids, safe_lane]
    pos = jnp.where(jnp.isneginf(best), -1, pos)

    xs = xb_lists[lids, safe_lane]                    # (nq, k_scan, d)
    if sim:
        s2 = jnp.einsum("qd,qcd->qc", xq, xs,
                        precision=lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
    else:
        diff = xs - xq[:, None, :]
        s2 = -jnp.sum(diff * diff, axis=-1)
    s2 = jnp.where(jnp.isneginf(best), _NEG_INF, s2)
    best, sel2 = lax.top_k(s2, k)
    pos = jnp.take_along_axis(pos, sel2, axis=1)
    pos = jnp.where(jnp.isneginf(best), -1, pos)
    return best, pos
