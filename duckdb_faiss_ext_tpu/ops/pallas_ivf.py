"""Pallas TPU kernel: IVF inverted-list scan via scalar-prefetched DMA.

The gather-based IVF scan (ops/ivf_scan.py) is bottlenecked by XLA's row
gather — TPUs hate data-dependent row addressing.  This kernel exploits the
structure XLA can't see: an inverted list is a *contiguous block*.  Lists
are stored padded as (nlist, lmax, d); the grid walks (query, probe-group)
pairs and a scalar-prefetched probe table drives the BlockSpec index maps,
so the Pallas pipeline DMAs exactly the probed list blocks HBM→VMEM,
double-buffered across grid steps (the PrefetchScalarGridSpec pattern from
the TPU kernel playbook).  ``WAYS`` lists are scanned per grid step —
several in_specs alias the same array with staggered index maps — to
amortise per-step pipeline overhead (~10 µs/step measured).

The kernel emits masked per-candidate scores (max-oriented, -inf for
padding/filtered rows); top-k selection and position resolution stay
outside in XLA, whose TopK custom-call is fast, operating on the compact
(nq, nprobe·lmax) score matrix — ~1000× smaller than the corpus.

Equivalent of faiss::IndexIVF's scan_codes loops as the reference drives
them (nprobe search params, src/faiss_extension.cpp:675-689), exact within
the probed lists.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float("-inf")

#: lists scanned per grid step (amortises per-step pipeline overhead)
WAYS = 4

#: VMEM budget for the double-buffered list blocks (of the 16 MB core
#: VMEM; the rest covers the output block, query block, and the score
#: temporaries Mosaic stack-allocates — measured 16.12 MB total at
#: ways=4 × lmax=4096 × d=96, i.e. 3.5 MB of non-list overhead).
_LIST_VMEM_BUDGET = 11 << 20


def choose_ways(nprobe: int, lmax: int, width_bytes: int) -> int:
    """Largest ways (4/2/1) whose double-buffered list blocks fit VMEM and
    divide nprobe — large lmax·d shrinks the multi-way window."""
    for w in (WAYS, 2, 1):
        if nprobe % w == 0 and w * lmax * width_bytes * 2 \
                <= _LIST_VMEM_BUDGET:
            return w
    return 1


def _score_block(q, block, metric):
    if metric == "INNER_PRODUCT":
        return jnp.sum(block * q[None, :], axis=1)       # (lmax,)
    diff = block - q[None, :]                            # L2, negated
    return -jnp.sum(diff * diff, axis=1)


def _scan_kernel(pids_ref, counts_ref, xq_ref, *rest, nprobe: int,
                 metric: str, ways: int, has_mask: bool):
    list_refs = rest[:ways]
    if has_mask:
        mask_refs = rest[ways:2 * ways]
        out_ref = rest[2 * ways]
    else:
        mask_refs = None
        out_ref = rest[ways]

    i = pl.program_id(0)
    j = pl.program_id(1)
    q = xq_ref[0, 0, :]                                   # (d,)
    lmax = list_refs[0].shape[1]
    lane = lax.broadcasted_iota(jnp.int32, (1, lmax), 1)[0]

    for w in range(ways):
        lid = pids_ref[(i * nprobe) + j * ways + w]
        cnt = counts_ref[lid]
        s = _score_block(q, list_refs[w][0], metric)
        valid = lane < cnt
        if has_mask:
            valid = jnp.logical_and(valid, mask_refs[w][0, 0] != 0)
        out_ref[0, w, 0, :] = jnp.where(valid, s, _NEG_INF)


@functools.partial(
    jax.jit,
    static_argnames=("k", "nprobe", "metric", "interpret"),
)
def pallas_ivf_search(
    xb_lists,      # (nlist, lmax, d) fp32, padded per list
    counts,        # (nlist,) int32 valid rows per list
    row_pos,       # (nlist, lmax) int32 original positions, -1 padding
    probe_ids,     # (nq, nprobe) int32 top-nprobe lists per query
    xq,            # (nq, d) fp32
    mask,          # (nlist, lmax) int8 selector mask or None
    *,
    k: int,
    nprobe: int,
    metric: str,
    interpret: bool = False,
):
    """Returns (scores (nq, k) max-oriented with -inf missing, positions
    (nq, k) int32 original row ids, -1 missing)."""
    nlist, lmax, d = xb_lists.shape
    nq = xq.shape[0]
    ways = choose_ways(nprobe, lmax, d * 4)
    has_mask = mask is not None

    def list_spec(w):
        return pl.BlockSpec(
            (1, lmax, d),
            lambda i, j, pids, cnts, w=w: (pids[i * nprobe + j * ways + w],
                                           0, 0),
            memory_space=pltpu.VMEM)

    def mask_spec(w):
        return pl.BlockSpec(
            (1, 1, lmax),
            lambda i, j, pids, cnts, w=w: (pids[i * nprobe + j * ways + w],
                                           0, 0),
            memory_space=pltpu.VMEM)

    # Mosaic requires block dims to be tile-divisible or equal to the
    # array dim — singleton axes satisfy the latter for per-row blocks.
    in_specs = [pl.BlockSpec((1, 1, d), lambda i, j, pids, cnts: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [list_spec(w) for w in range(ways)]
    args = [probe_ids.reshape(-1).astype(jnp.int32),
            counts.astype(jnp.int32), xq.reshape(nq, 1, d)]
    args += [xb_lists] * ways
    if has_mask:
        in_specs += [mask_spec(w) for w in range(ways)]
        args += [mask.reshape(nlist, 1, lmax)] * ways

    kernel = functools.partial(_scan_kernel, nprobe=nprobe, metric=metric,
                               ways=ways, has_mask=has_mask)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nq, nprobe // ways),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, ways, 1, lmax),
                               lambda i, j, pids, cnts: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    scores = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nq, nprobe, 1, lmax), jnp.float32),
        interpret=interpret,
    )(*args)

    from .flat_search import exact_topk

    flat = scores.reshape(nq, nprobe * lmax)
    best, sel = exact_topk(flat, k)                     # (nq, k)
    # Resolve positions: sel → (probe slot, lane) → list id → original row.
    probe_slot = sel // lmax
    lane = sel % lmax
    lids = jnp.take_along_axis(probe_ids, probe_slot, axis=1)  # (nq, k)
    pos = row_pos[lids, lane]
    pos = jnp.where(jnp.isneginf(best), -1, pos)
    return best, pos


def choose_lmax(counts_max: int) -> int:
    """Pad list length: ≥ 128 lanes, powers of two up to 512, then the
    next multiple of 512 (tile-divisible for fp32/int8 blocks).  Pure
    pow2 padding wasted up to 2× HBM on the payload (6.4 GB → 4 GB at
    the measured 10M×96 layout)."""
    if counts_max <= 512:
        lmax = 128
        while lmax < counts_max:
            lmax *= 2
        return lmax
    return 512 * -(-counts_max // 512)


def _gather_kernel(pids_ref, *rest, nprobe: int, ways: int):
    list_refs = rest[:ways]
    out_ref = rest[ways]
    for w in range(ways):
        out_ref[0, w, 0, :, :] = list_refs[w][0]


@functools.partial(jax.jit, static_argnames=("nprobe", "interpret"))
def pallas_gather_lists(lists, probe_ids, *, nprobe: int,
                        interpret: bool = False):
    """Compact the probed list blocks into a contiguous buffer.

    lists: (nlist, lmax, w) any dtype → (nq, nprobe, lmax, w).  Pure data
    movement: the Pallas pipeline streams exactly the probed blocks
    (scalar-prefetched index maps), replacing XLA's slow row gather; the
    caller runs decode/score on the compacted result where XLA is strong.
    Used for the IVFPQ path, where a code block is only lmax×m bytes."""
    nlist, lmax, width = lists.shape
    nq = probe_ids.shape[0]
    ways = choose_ways(nprobe, lmax, width * lists.dtype.itemsize)

    def lspec(w):
        return pl.BlockSpec(
            (1, lmax, width),
            lambda i, j, pids, w=w: (pids[i * nprobe + j * ways + w], 0, 0),
            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nq, nprobe // ways),
        in_specs=[lspec(w) for w in range(ways)],
        out_specs=pl.BlockSpec(
            (1, ways, 1, lmax, width),
            lambda i, j, pids: (i, j, 0, 0, 0),
            memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_gather_kernel, nprobe=nprobe, ways=ways),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nq, nprobe, 1, lmax, width),
                                       lists.dtype),
        interpret=interpret,
    )(probe_ids.reshape(-1).astype(jnp.int32), *([lists] * ways))
    return out.reshape(nq, nprobe, lmax, width)


@functools.partial(
    jax.jit,
    static_argnames=("k", "nprobe", "metric", "q_chunk", "precision", "codec",
                     "interpret"),
)
def pallas_ivf_pq_search(
    codes_lists,    # (nlist, lmax, m) uint8 padded per list
    counts,         # (nlist,) int32
    row_pos,        # (nlist, lmax) int32
    codebooks,      # (m, ksub, dsub) fp32 residual codebooks
    centroids,      # (nlist, d) fp32
    probe_ids,      # (nq, nprobe) int32
    xq,             # (nq, d) fp32
    mask,           # (nlist, lmax) int8 or None
    *,
    k: int,
    nprobe: int,
    metric: str,
    q_chunk: int,
    precision,
    interpret: bool = False,
    codec: str = "pq",
):
    """IVF-PQ/RQ scan: Pallas compacts the probed byte-code blocks, XLA
    decodes residuals (+ list centroid) and scores on the MXU in query
    chunks — identical results to residual LUT-ADC for L2/IP."""
    from .flat_search import _NEG_INF, exact_topk
    from .pq import codec_decode

    nlist, lmax, m = codes_lists.shape
    nq, d = xq.shape
    sim = metric == "INNER_PRODUCT"

    gathered = pallas_gather_lists(codes_lists, probe_ids, nprobe=nprobe,
                                   interpret=interpret)   # (nq,np,lmax,m)
    ncand = nprobe * lmax

    def chunk(i, carry):
        bs, bp = carry
        q0 = i * q_chunk
        xq_c = lax.dynamic_slice(xq, (q0, 0), (q_chunk, d))
        pids_c = lax.dynamic_slice(probe_ids, (q0, 0), (q_chunk, nprobe))
        codes_c = lax.dynamic_slice(
            gathered, (q0, 0, 0, 0), (q_chunk, nprobe, lmax, m))
        resid = codec_decode(codes_c.reshape(-1, m), codebooks, codec)
        cents = centroids[pids_c]                       # (qc, np, d)
        xc = (resid.reshape(q_chunk, nprobe, lmax, d)
              + cents[:, :, None, :])
        if sim:
            s = jnp.einsum("qd,qpld->qpl", xq_c, xc, precision=precision,
                           preferred_element_type=jnp.float32)
        else:
            diff = xc - xq_c[:, None, None, :]
            s = -jnp.sum(diff * diff, axis=-1)
        lane = lax.broadcasted_iota(jnp.int32, (q_chunk, nprobe, lmax), 2)
        valid = lane < counts[pids_c][:, :, None]
        if mask is not None:
            valid = jnp.logical_and(valid, mask[pids_c] != 0)
        s = jnp.where(valid, s, _NEG_INF)
        best, sel = exact_topk(s.reshape(q_chunk, ncand), k)
        slot, ln = sel // lmax, sel % lmax
        lids = jnp.take_along_axis(pids_c, slot, axis=1)
        pos = row_pos[lids, ln]
        pos = jnp.where(jnp.isneginf(best), -1, pos)
        bs = lax.dynamic_update_slice(bs, best, (q0, 0))
        bp = lax.dynamic_update_slice(bp, pos, (q0, 0))
        return bs, bp

    init = (jnp.full((nq, k), _NEG_INF, jnp.float32),
            jnp.full((nq, k), -1, jnp.int32))
    return lax.fori_loop(0, nq // q_chunk, chunk, init)


def sq_exact_rerank(codes_lists, lids, lane, pos, best, xq, vmin, scale,
                    *, codec: str, k: int, metric: str):
    """Shared epilogue of the SQ list-scan kernels (per-query and
    pair-tile): decode only the selected rows from the padded layout
    itself, re-score fp32 at HIGHEST, and take the final top-k.
    ``best`` is the int8-score ranking of the k_scan pool; returns
    (scores (nq, k) fp32-exact, positions (nq, k), -1 missing)."""
    nq, k_scan = lids.shape
    d = vmin.shape[0]

    def rerank_block(argsb):
        xq_b, lids_b, lane_b, best_b = argsb
        qb = xq_b.shape[0]
        if codec == "sq6":
            # flat-row gather on the (nlist*3*lmax, d4) bitcast reshape:
            # the mixed advanced/basic form codes[lids, :, lane] makes
            # XLA materialise a TRANSPOSED copy of the whole plane-major
            # payload (11.25 GiB at marco — HBM OOM 26.37G, 2026-08-20),
            # exactly like the scatter in models/ivf_device.py.
            nlist_, l3_, d4 = codes_lists.shape
            lmax_ = l3_ // 3
            fl = codes_lists.reshape(nlist_ * l3_, d4)
            base_r = lids_b * (3 * lmax_) + lane_b    # (qb, k_scan)
            idx3 = jnp.stack([base_r, base_r + lmax_,
                              base_r + 2 * lmax_], axis=-1)
            planes = fl[idx3]                         # (qb, k_scan, 3, d4)
            crows = jnp.transpose(planes, (0, 1, 3, 2)).reshape(
                qb, k_scan, 3 * d4)
            wbytes = 3 * d4
        else:
            crows = codes_lists[lids_b, lane_b]       # (qb, k_scan, w)
            wbytes = codes_lists.shape[2]
        if codec == "sq8":
            xs = crows.astype(jnp.float32) * scale + vmin
        else:
            from .sq import sq_decode

            xs = sq_decode(crows.reshape(-1, wbytes), vmin, scale,
                           codec).reshape(qb, k_scan, d)
        if metric == "INNER_PRODUCT":
            s2 = jnp.einsum("qd,qcd->qc", xq_b, xs,
                            precision=lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
        else:
            diff = xs - xq_b[:, None, :]
            s2 = -jnp.sum(diff * diff, axis=-1)
        return jnp.where(jnp.isneginf(best_b), _NEG_INF, s2)

    # Query-blocked so the decoded (qc, k_scan, d) fp32 tile stays
    # ~128 MB: the filtered bench's binomial k'=1874 made the unblocked
    # gather a 2.2 GB allocation next to the 12 GiB marco payload
    # (RESOURCE_EXHAUSTED, 2026-08-20).
    qc = min(nq, max(1, (1 << 25) // max(k_scan * d, 1)))
    while nq % qc:
        qc -= 1
    if qc == nq:
        s2 = rerank_block((xq, lids, lane, best))
    else:
        nb = nq // qc
        s2 = lax.map(rerank_block,
                     (xq.reshape(nb, qc, -1),
                      lids.reshape(nb, qc, k_scan),
                      lane.reshape(nb, qc, k_scan),
                      best.reshape(nb, qc, k_scan))).reshape(nq, k_scan)
    best, sel2 = lax.top_k(s2, k)
    pos = jnp.take_along_axis(pos, sel2, axis=1)
    return best, jnp.where(jnp.isneginf(best), -1, pos)


def _sq_scan_kernel(pids_ref, counts_ref, ui_ref, qs_ref, *rest,
                    nprobe: int, metric: str, ways: int, has_mask: bool,
                    codec: str, digit_dtype: str = "int8"):
    """Int8 list scan for SQ8/SQ4/SQ6 payloads: per probed list block,
    int8 MXU dots against the pre-quantized query digits; scores
    reconstructed fp32 via the per-query scalars (su2, shift·Σũ, base, μ)
    and the per-row code sum (the recentred two-digit scheme of
    ops/sq.py::sq_query_digits — a single int8 digit's noise swamps
    clustered corpora's distance gaps):

        u·c = su2·(128·(hi·c') + lo·c') + shift·Σũ + μ·Σc

    SQ8: c' = c − 128 ≡ c⊕0x80 (two's-complement reinterpretation, a
    pure bitwise VPU op).
    SQ4: nibbles 0..15 fit int8 directly (no shift; qscal[1] = 0) — the
    query splits into even/odd dims outside the kernel and the score is
    two dots, one against each nibble plane (byte j of a row packs dims
    2j low / 2j+1 high, ops/sq.py::sq_unpack_i8) — no int8 reshapes,
    which Mosaic rejects.

    SQ6: the packed row layout (4 codes per 3 bytes) cannot be bit-sliced
    in-kernel without 8-bit reshapes, so its payload is stored PLANE-MAJOR
    — (nlist, 3*lmax, ceil(d/4)) with byte b of every 3-byte group in
    rows [b*lmax, (b+1)*lmax) — and each block arrives as (3*lmax, d4)
    (the folded sublane axis keeps the operand (8,128)-tileable; a 4-D
    block forced a 15 G relaid payload copy at marco).  The four 6-bit
    codes of a group come out of the three planes with the same
    widen-shift-truncate ops as SQ4, each shaped (lmax, d4), and the
    score is four dots against the four query dim-planes (dims x::4).
    Codes 0..63 fit int8 directly (qscal[1] = 0)."""
    list_refs = rest[:ways]
    norm_refs = rest[ways:2 * ways]
    rowsum_refs = rest[2 * ways:3 * ways]
    if has_mask:
        mask_refs = rest[3 * ways:4 * ways]
        out_ref = rest[4 * ways]
    else:
        mask_refs = None
        out_ref = rest[3 * ways]

    i = pl.program_id(0)
    j = pl.program_id(1)
    ui_mat = ui_ref[0]                 # (2, w') int8 query digits hi/lo
    wq = ui_mat.shape[1]
    su2 = qs_ref[i, 0]
    c0 = qs_ref[i, 1]                                     # shift·Σũ
    base = qs_ref[i, 2]                                   # ‖t‖² (L2) / q·vmin
    mu = qs_ref[i, 3]                                     # per-query mean(u)
    # sq6 blocks are (1, 3*lmax, d4) plane-major; others (1, lmax, w).
    lmax = (list_refs[0].shape[1] // 3 if codec == "sq6"
            else list_refs[0].shape[1])
    lane = lax.broadcasted_iota(jnp.int32, (1, lmax), 1)[0]
    sim = metric == "INNER_PRODUCT"

    # Sub-tile the unpack+score (sq_digits.sq_utile): the sq4/sq6 i32
    # widen and sq8's xor copy land on the scoped-VMEM stack next to the
    # double-buffered list blocks — whole-block scratch blew the 16 MB
    # limit on the real chip at the 8.8M×1536 marco shape.
    from .sq_digits import sq_block_digit_dot, sq_utile

    wb = (3 * list_refs[0].shape[2] if codec == "sq6"
          else list_refs[0].shape[2])
    utile = sq_utile(codec, lmax, wb, 2 * ways * lmax * wb,
                     dtype=digit_dtype)

    for w in range(ways):
        lid = pids_ref[(i * nprobe) + j * ways + w]
        cnt = counts_ref[lid]
        block = list_refs[w][0]                           # (lmax, d) uint8
        rowsum_w = rowsum_refs[w][0, 0]                   # (lmax,) fp32
        norm_w = None if sim else norm_refs[w][0, 0]      # (lmax,) fp32
        mask_w = mask_refs[w][0, 0] if has_mask else None

        for t0 in range(0, lmax, utile):
            ut = min(utile, lmax - t0)       # adaptive utile (sq8) may
            digit_dot = sq_block_digit_dot(block, t0, ut, codec,
                                           dtype=digit_dtype)
            dot2 = digit_dot(ui_mat)          # (2, ut): hi row 0, lo row 1
            dot_hi = dot2[0]
            dot_lo = dot2[1]
            utc = su2 * (128.0 * dot_hi.astype(jnp.float32)
                         + dot_lo.astype(jnp.float32))
            uc = utc + c0 + mu * lax.slice(rowsum_w, (t0,), (t0 + ut,))
            if sim:
                s = base + uc
            else:
                rn = lax.slice(norm_w, (t0,), (t0 + ut,))
                s = -jnp.maximum(base - 2.0 * uc + rn, 0.0)
            valid = lax.slice(lane, (t0,), (t0 + ut,)) < cnt
            if has_mask:
                valid = jnp.logical_and(
                    valid, lax.slice(mask_w, (t0,), (t0 + ut,)) != 0)
            out_ref[0, w, 0, t0:t0 + ut] = jnp.where(valid, s, _NEG_INF)


@functools.partial(
    jax.jit,
    static_argnames=("k", "k_scan", "nprobe", "metric", "codec",
                     "interpret", "digit_dtype"),
)
def pallas_ivf_sq_search(
    codes_lists,   # (nlist, lmax, w) uint8 padded SQ code lists
    row_norm,      # (nlist, lmax) fp32 Σ(scale·c)² per padded slot
    row_sum,       # (nlist, lmax) fp32 Σ c (raw code sum) per padded slot
    counts,        # (nlist,) int32 valid rows per list
    row_pos,       # (nlist, lmax) int32 original positions, -1 padding
    vmin,          # (d,) fp32 SQ ranges
    scale,
    probe_ids,     # (nq, nprobe) int32
    xq,            # (nq, d) fp32
    mask,          # (nlist, lmax) int8 selector mask or None
    *,
    k: int,
    k_scan: int,
    nprobe: int,
    metric: str,
    codec: str = "sq8",
    interpret: bool = False,
    digit_dtype: str = "int8",
):
    """Fused int8 DMA list-scan for IVF,SQ8 / IVF,SQ4 / IVF,SQ6 (L2 /
    INNER_PRODUCT): probed code blocks stream HBM→VMEM (double-buffered,
    ways-amortized) and are scored in-kernel with int8 MXU dots — no
    decoded intermediate and no descriptor-bound row gather.  SQ4 halves
    the DMA traffic again (two nibble-plane dots per block); SQ6 reads a
    plane-major payload (see _sq_scan_kernel).  Only the query row is
    quantized — recentred two-digit int8, 15-bit effective
    (ops/sq.py::sq_query_digits) — and a decode+fp32 rerank of the
    widened top-k outside the kernel restores exact distances.  Same
    output conventions as pallas_ivf_search."""
    from .sq import SQ_INT8_SHIFT, sq_query_digits

    if codec == "sq6":
        nlist, l3, d4 = codes_lists.shape        # plane-major (see kernel)
        lmax = l3 // 3
        wbytes = 3 * d4
    else:
        nlist, lmax, wbytes = codes_lists.shape
    d = vmin.shape[0]
    nq = xq.shape[0]
    ways = choose_ways(nprobe, lmax, wbytes)     # uint8: wbytes per row
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
    if codec == "sq8":
        # The kernel's c' = c⊕0x80 recentres sq8 codes by 128; sq4/sq6
        # nibble/plane codes enter the dots raw (shift = 0 in-kernel),
        # so their u·c needs no Σũ correction.
        c0 = shift * sum_ut
    else:
        c0 = jnp.zeros_like(su2)

    from .sq_digits import sq_pack_query_planes

    ui_pack = jnp.stack([sq_pack_query_planes(hi, d, wbytes, codec),
                         sq_pack_query_planes(lo, d, wbytes, codec)], axis=1)
    ui_width = ui_pack.shape[2]                  # (nq, 2, w')
    qscal = jnp.stack([su2, c0, base, mu], axis=1)        # (nq, 4) fp32

    def list_spec(w):
        if codec == "sq6":
            return pl.BlockSpec(
                (1, 3 * lmax, d4),
                lambda i, j, pids, cnts, w=w: (
                    pids[i * nprobe + j * ways + w], 0, 0),
                memory_space=pltpu.VMEM)
        return pl.BlockSpec(
            (1, lmax, wbytes),
            lambda i, j, pids, cnts, w=w: (pids[i * nprobe + j * ways + w],
                                           0, 0),
            memory_space=pltpu.VMEM)

    def lane_spec(w):
        return pl.BlockSpec(
            (1, 1, lmax),
            lambda i, j, pids, cnts, w=w: (pids[i * nprobe + j * ways + w],
                                           0, 0),
            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, 2, ui_width), lambda i, j, pids, cnts: (i, 0, 0),
                     memory_space=pltpu.VMEM),     # query digits hi/lo
        # Whole scalar table as one SMEM block (per-row blocks would hit
        # Mosaic's 8x128 block-shape rule); kernel indexes by program_id.
        pl.BlockSpec((nq, 4), lambda i, j, pids, cnts: (0, 0),
                     memory_space=pltpu.SMEM),            # per-query scalars
    ]
    args = [probe_ids.reshape(-1).astype(jnp.int32),
            counts.astype(jnp.int32),
            ui_pack, qscal]
    in_specs += [list_spec(w) for w in range(ways)]
    args += [codes_lists] * ways
    in_specs += [lane_spec(w) for w in range(ways)]
    args += [row_norm.reshape(nlist, 1, lmax)] * ways
    in_specs += [lane_spec(w) for w in range(ways)]
    args += [row_sum.reshape(nlist, 1, lmax)] * ways
    if has_mask:
        in_specs += [lane_spec(w) for w in range(ways)]
        args += [mask.reshape(nlist, 1, lmax)] * ways

    kernel = functools.partial(_sq_scan_kernel, nprobe=nprobe,
                               metric=metric, ways=ways, has_mask=has_mask,
                               codec=codec, digit_dtype=digit_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nq, nprobe // ways),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, ways, 1, lmax),
                               lambda i, j, pids, cnts: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    scores = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nq, nprobe, 1, lmax), jnp.float32),
        interpret=interpret,
    )(*args)

    from .flat_search import exact_topk

    flat = scores.reshape(nq, nprobe * lmax)
    best, sel = exact_topk(flat, k_scan)
    probe_slot = sel // lmax
    lane = sel % lmax
    lids = jnp.take_along_axis(probe_ids, probe_slot, axis=1)  # (nq, k_scan)
    pos = row_pos[lids, lane]
    return sq_exact_rerank(codes_lists, lids, lane, pos, best, xq, vmin,
                           scale, codec=codec, k=k, metric=metric)
