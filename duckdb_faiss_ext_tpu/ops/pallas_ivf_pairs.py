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

def pairs_t_max(nq: int, nprobe: int, nlist: int) -> int:
    """Static worst-case tile count: every list's pairs fill
    ``floor(npair/QG)`` whole tiles at most, plus at most one partial
    tile per active list."""
    npair = nq * nprobe
    return npair // QG + min(nlist, npair)


@functools.partial(jax.jit, static_argnames=("nlist", "t_max"))
def build_pair_tiles(probe_ids, *, nlist: int, t_max: int):
    """Invert (nq, nprobe) probe ids into per-list query tiles.

    Returns (tile_list (t_max,) int32 — list id per tile, 0 for padding;
    tile_q (t_max, QG) int32 — query ids, -1 for empty slots;
    pair_slot (nq, nprobe) int32 — flat (tile*QG + slot) output index of
    each original pair).  Pure static-shape XLA (sorts + scatters)."""
    nq, nprobe = probe_ids.shape
    npair = nq * nprobe
    lists = probe_ids.reshape(-1).astype(jnp.int32)
    qid = (jnp.arange(npair, dtype=jnp.int32) // nprobe)
    order = jnp.argsort(lists, stable=True)
    sl = lists[order]
    sq = qid[order]
    m = jnp.zeros((nlist,), jnp.int32).at[lists].add(1)
    tiles_pl = (m + QG - 1) // QG
    start_tile = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(tiles_pl)[:-1]])
    first_idx = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(m)[:-1]])
    r = jnp.arange(npair, dtype=jnp.int32) - first_idx[sl]
    tile = start_tile[sl] + r // QG
    slot = r % QG
    tile_q = jnp.full((t_max, QG), -1, jnp.int32).at[tile, slot].set(sq)
    tile_list = jnp.zeros((t_max,), jnp.int32).at[tile].set(sl)
    pair_slot = (jnp.zeros((npair,), jnp.int32)
                 .at[order].set(tile * QG + slot).reshape(nq, nprobe))
    return tile_list, tile_q, pair_slot


def _pairs_sq_kernel(tlist_ref, counts_ref, ui_ref, qs_ref, *rest,
                     metric: str, codec: str, has_mask: bool):
    codes_ref, rn_ref, rs_ref = rest[0], rest[1], rest[2]
    if has_mask:
        mask_ref = rest[3]
        out_ref = rest[4]
    else:
        mask_ref = None
        out_ref = rest[3]

    t = pl.program_id(0)
    lid = tlist_ref[t]
    cnt = counts_ref[lid]
    ui = ui_ref[0]                                    # (QG, 2*wq) int8
    wq = ui.shape[1] // 2
    su2 = qs_ref[0, :, 0]                             # (QG,)
    c0 = qs_ref[0, :, 1]
    base = qs_ref[0, :, 2]                            # ±inf on empty slots
    mu = qs_ref[0, :, 3]
    block = codes_ref[0]                              # (lmax, w) uint8
    lmax = block.shape[0] if codec != "sq6" else block.shape[1]
    sim = metric == "INNER_PRODUCT"

    # Digit dots on the MXU: (QG, wq) x (lmax-tile, wq) contractions.
    # sq4/sq6 widen the unpack per ≤512-row sub-tile (Mosaic cannot shift
    # i8 vectors; a whole-block i32 widen blew scoped VMEM at wide d —
    # same constraints as ops/pallas_ivf.py::_sq_scan_kernel).  sq8's
    # XOR+bitcast also materialises a block-sized i8 copy on the scoped
    # stack (18.3 MB at lmax 4096 x d 1536, on-chip compile failure), so
    # it sub-tiles too — bounded to ~1.5 MB of scratch.
    if codec == "sq8":
        # Adaptive: one big xor+dot step when VMEM allows (fewer serial
        # sub-tile chains per tile), bounded by what is left after the
        # double-buffered block + score tile.
        wb = block.shape[1]
        left = (13 << 20) - 2 * lmax * wb - 8 * lmax * 8
        utile = min(lmax, max(512, left // max(wb, 1) // 512 * 512))
    else:
        utile = min(lmax, 512)
    hi_q = lax.slice(ui, (0, 0), (QG, wq))
    lo_q = lax.slice(ui, (0, wq), (QG, 2 * wq))

    dh_parts, dl_parts = [], []
    for t0 in range(0, lmax, utile):
        ut = min(utile, lmax - t0)           # adaptive utile (sq8) may
        if codec == "sq6":                   # not divide lmax
            d4 = block.shape[2]                       # (3, lmax, d4)
            b0 = lax.slice(block, (0, t0, 0),
                           (1, t0 + ut, d4))[0].astype(jnp.int32)
            b1 = lax.slice(block, (1, t0, 0),
                           (2, t0 + ut, d4))[0].astype(jnp.int32)
            b2 = lax.slice(block, (2, t0, 0),
                           (3, t0 + ut, d4))[0].astype(jnp.int32)
            planes = ((b0 >> 2).astype(jnp.int8),
                      (((b0 & 3) << 4) | (b1 >> 4)).astype(jnp.int8),
                      (((b1 & 15) << 2) | (b2 >> 6)).astype(jnp.int8),
                      (b2 & 63).astype(jnp.int8))

            def digit_dot(ug, planes=planes, d4=d4):
                dot = jnp.zeros((QG, ut), jnp.int32)
                for x, cx in enumerate(planes):
                    ui_x = lax.slice(ug, (0, x * d4), (QG, (x + 1) * d4))
                    dot = dot + jax.lax.dot_general(
                        ui_x, cx, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32)
                return dot
        elif codec == "sq4":
            w_half = block.shape[1]
            b32 = lax.slice(block, (t0, 0),
                            (t0 + ut, w_half)).astype(jnp.int32)
            nib_lo = (b32 & 0x0F).astype(jnp.int8)
            nib_hi = (b32 >> 4).astype(jnp.int8)

            def digit_dot(ug, w_half=w_half, nl=nib_lo, nh=nib_hi):
                ui_e = lax.slice(ug, (0, 0), (QG, w_half))
                ui_o = lax.slice(ug, (0, w_half), (QG, 2 * w_half))
                return (jax.lax.dot_general(
                            ui_e, nl, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)
                        + jax.lax.dot_general(
                            ui_o, nh, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32))
        else:
            ci8 = pltpu.bitcast(
                lax.slice(block, (t0, 0), (t0 + ut, block.shape[1]))
                ^ jnp.uint8(0x80), jnp.int8)

            def digit_dot(ug, ci8=ci8):
                return jax.lax.dot_general(
                    ug, ci8, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)   # (QG, utile)
        dh_parts.append(digit_dot(hi_q))
        dl_parts.append(digit_dot(lo_q))
    dot_hi = (dh_parts[0] if len(dh_parts) == 1
              else jnp.concatenate(dh_parts, axis=1))
    dot_lo = (dl_parts[0] if len(dl_parts) == 1
              else jnp.concatenate(dl_parts, axis=1))

    rs_row = rs_ref[0, 0]                             # (lmax,)
    utc = su2[:, None] * (128.0 * dot_hi.astype(jnp.float32)
                          + dot_lo.astype(jnp.float32))
    uc = utc + c0[:, None] + mu[:, None] * rs_row[None, :]
    if sim:
        score = base[:, None] + uc                    # -inf rows stay -inf
    else:
        rn_row = rn_ref[0, 0]
        score = -jnp.maximum(base[:, None] - 2.0 * uc + rn_row[None, :],
                             0.0)
    lane = lax.broadcasted_iota(jnp.int32, (QG, lmax), 1)
    valid = lane < cnt
    if has_mask:
        valid = jnp.logical_and(valid, mask_ref[0, 0][None, :] != 0)
    out_ref[0] = jnp.where(valid, score, _NEG_INF)


@functools.partial(
    jax.jit,
    static_argnames=("k", "k_scan", "nprobe", "metric", "codec",
                     "interpret"),
)
def pallas_ivf_sq_pairs_search(
    codes_lists,   # (nlist, lmax, w) uint8 / (nlist, 3, lmax, d4) sq6
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
):
    """MXU-batched IVF-SQ list scan (see module docstring).  Same output
    conventions as pallas_ivf_sq_search: (scores (nq, k) max-oriented
    fp32-exact after rerank, positions (nq, k) int32, -1 missing)."""
    from .sq import SQ_INT8_SHIFT, sq_query_digits

    if codec == "sq6":
        nlist, _, lmax, d4 = codes_lists.shape
        wbytes = 3 * d4
    else:
        nlist, lmax, wbytes = codes_lists.shape
    d = vmin.shape[0]
    nq = xq.shape[0]
    has_mask = mask is not None
    sim = metric == "INNER_PRODUCT"

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

    def pack_planes(digit):
        if codec == "sq4":
            pad = 2 * wbytes - d
            dp = jnp.pad(digit, ((0, 0), (0, pad)))
            return jnp.concatenate([dp[:, 0::2], dp[:, 1::2]], axis=1)
        if codec == "sq6":
            pad = 4 * d4 - d
            dp = jnp.pad(digit, ((0, 0), (0, pad)))
            return jnp.concatenate([dp[:, x::4] for x in range(4)], axis=1)
        return digit

    ui_pack = jnp.concatenate([pack_planes(hi), pack_planes(lo)], axis=1)
    wq = ui_pack.shape[1] // 2                        # (nq, 2*wq) int8
    qscal = jnp.stack([su2, c0, base, mu], axis=1)    # (nq, 4) fp32

    # Tile table + per-tile gathered query operands.
    t_max = pairs_t_max(nq, nprobe, nlist)
    tile_list, tile_q, pair_slot = build_pair_tiles(
        probe_ids.astype(jnp.int32), nlist=nlist, t_max=t_max)
    safe_q = jnp.maximum(tile_q, 0)
    ui_t = ui_pack[safe_q]                            # (t_max, QG, 2*wq)
    qs_t = qscal[safe_q]                              # (t_max, QG, 4)
    # Empty slots score -inf via base: IP adds base directly; L2 negates
    # a max() with base inside, so +inf there also yields -inf.
    dead = jnp.inf if not sim else -jnp.inf
    qs_t = qs_t.at[:, :, 2].set(
        jnp.where(tile_q < 0, dead, qs_t[:, :, 2]))

    def lspec():
        if codec == "sq6":
            return pl.BlockSpec((1, 3, lmax, d4),
                                lambda i, tl, cn: (tl[i], 0, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, lmax, wbytes),
                            lambda i, tl, cn: (tl[i], 0, 0),
                            memory_space=pltpu.VMEM)

    def lanespec():
        return pl.BlockSpec((1, 1, lmax), lambda i, tl, cn: (tl[i], 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, QG, 2 * wq), lambda i, tl, cn: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, QG, 4), lambda i, tl, cn: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        lspec(), lanespec(), lanespec(),
    ]
    args = [tile_list, counts.astype(jnp.int32), ui_t, qs_t, codes_lists,
            row_norm.reshape(nlist, 1, lmax),
            row_sum.reshape(nlist, 1, lmax)]
    if has_mask:
        in_specs.append(lanespec())
        args.append(mask.reshape(nlist, 1, lmax))

    kernel = functools.partial(_pairs_sq_kernel, metric=metric,
                               codec=codec, has_mask=has_mask)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_max,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, QG, lmax), lambda i, tl, cn: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    raw = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_max, QG, lmax), jnp.float32),
        interpret=interpret,
    )(*args)

    # Static inverse ROW gather: every original (query, probe) pair owns
    # one (tile, slot) score row; then the per-query kernel's epilogue.
    from .pallas_ivf import sq_exact_rerank

    pv = (raw.reshape(t_max * QG, lmax)[pair_slot.reshape(-1)]
          .reshape(nq, nprobe * lmax))
    k_scan = min(k_scan, nprobe * lmax)
    best, sel = exact_topk(pv, k_scan)
    safe_lane = sel % lmax
    lids = jnp.take_along_axis(probe_ids, sel // lmax, axis=1)
    pos = row_pos[lids, safe_lane]
    return sq_exact_rerank(codes_lists, lids, safe_lane, pos, best, xq,
                           vmin, scale, codec=codec, k=k, metric=metric)


def _pairs_flat_kernel(tlist_ref, counts_ref, xq_ref, qs_ref, *rest,
                       metric: str, has_mask: bool, precision):
    codes_ref = rest[0]
    if has_mask:
        mask_ref = rest[1]
        out_ref = rest[2]
    else:
        mask_ref = None
        out_ref = rest[1]

    t = pl.program_id(0)
    lid = tlist_ref[t]
    cnt = counts_ref[lid]
    q = xq_ref[0]                                     # (QG, d) fp32
    bias = qs_ref[0, :, 0]                            # -inf on dead slots
    qn = qs_ref[0, :, 1]
    block = codes_ref[0]                              # (lmax, d) fp32
    lmax = block.shape[0]

    xy = jax.lax.dot_general(q, block, (((1,), (1,)), ((), ())),
                             precision=precision,
                             preferred_element_type=jnp.float32)
    if metric == "INNER_PRODUCT":
        score = xy + bias[:, None]
    else:
        bn = jnp.sum(block * block, axis=1)[None, :]
        score = -jnp.maximum(qn[:, None] - 2.0 * xy + bn, 0.0) \
            + bias[:, None]
    lane = lax.broadcasted_iota(jnp.int32, (QG, lmax), 1)
    valid = lane < cnt
    if has_mask:
        valid = jnp.logical_and(valid, mask_ref[0, 0][None, :] != 0)
    out_ref[0] = jnp.where(valid, score, _NEG_INF)


@functools.partial(
    jax.jit,
    static_argnames=("k", "k_scan", "nprobe", "metric", "interpret"),
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
):
    """MXU-batched IVF,Flat list scan (pair tiles, see module docstring).
    Session-precision dots in-kernel + fp32 rerank of the k_scan
    selection outside; same output conventions as pallas_ivf_search."""
    from ..utils.config import config

    nlist, lmax, d = xb_lists.shape
    nq = xq.shape[0]
    has_mask = mask is not None
    sim = metric == "INNER_PRODUCT"

    t_max = pairs_t_max(nq, nprobe, nlist)
    tile_list, tile_q, pair_slot = build_pair_tiles(
        probe_ids.astype(jnp.int32), nlist=nlist, t_max=t_max)
    safe_q = jnp.maximum(tile_q, 0)
    xq_t = xq[safe_q]                                 # (t_max, QG, d)
    qn = jnp.sum(xq * xq, axis=1)
    qs_t = jnp.stack(
        [jnp.where(tile_q < 0, -jnp.inf, 0.0),
         qn[safe_q], jnp.zeros_like(safe_q, jnp.float32),
         jnp.zeros_like(safe_q, jnp.float32)], axis=2)  # (t_max, QG, 4)

    in_specs = [
        pl.BlockSpec((1, QG, d), lambda i, tl, cn: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, QG, 4), lambda i, tl, cn: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lmax, d), lambda i, tl, cn: (tl[i], 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [tile_list, counts.astype(jnp.int32), xq_t, qs_t, xb_lists]
    if has_mask:
        in_specs.append(
            pl.BlockSpec((1, 1, lmax), lambda i, tl, cn: (tl[i], 0, 0),
                         memory_space=pltpu.VMEM))
        args.append(mask.reshape(nlist, 1, lmax))

    kernel = functools.partial(_pairs_flat_kernel, metric=metric,
                               has_mask=has_mask,
                               precision=config.precision)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_max,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, QG, lmax), lambda i, tl, cn: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    raw = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_max, QG, lmax), jnp.float32),
        interpret=interpret,
    )(*args)

    pv = (raw.reshape(t_max * QG, lmax)[pair_slot.reshape(-1)]
          .reshape(nq, nprobe * lmax))
    k_scan = min(k_scan, nprobe * lmax)
    best, sel = exact_topk(pv, k_scan)
    safe_lane = sel % lmax
    lids = jnp.take_along_axis(probe_ids, sel // lmax, axis=1)
    pos = row_pos[lids, safe_lane]
    pos = jnp.where(jnp.isneginf(best), -1, pos)

    # fp32 rerank of the k_scan selection (kernel dots ran at session
    # precision).
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
