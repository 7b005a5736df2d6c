"""Pallas dense scan for the IVF overflow-spill region (SQ codecs).

The XLA spill scan (ops/ivf_scan.py::ivf_spill_scan) streams the spill
through per-chunk einsums, but its per-chunk membership/epilogue tensors
round-trip HBM and the whole fori chain measured ~0.27 µs/row at the
8.8M×1536 marco shape (1.05M spill rows × b1024 ≈ 286 ms) — ~10× the
bf16-MXU digit-dot floor.  This kernel fuses the whole per-chunk body:

* payload chunks stream HBM→VMEM on a STATIC sequential grid (the
  ~12.5 µs/step pipeline overhead costs ~6 ms at 512 steps — fine);
* probed-list membership in-kernel: nprobe fused lane compares of the
  chunk's assign row against each query's probe column (no gather);
* the shared two-digit int8 quantization dots (ops/sq_digits.py) score
  ALL queries against the chunk — M = 2·nq fills the MXU;
* per 128-lane window, the kernel reduces to (window max, global argmax)
  — the only HBM output is (nq, n_windows) fp32 + int32 (~33 MB at the
  marco shape vs 4.3 GB of raw scores).

Outside, the top ``k_scan`` windows per query yield candidate rows
(their argmaxes) which are decoded and re-scored fp32-exact — the same
widened-candidate + exact-rerank contract as the int8 padded kernels
(ranking is approximate pre-rerank there too; a window holding two
true top-k rows contributes its best, which the k_scan widening
absorbs exactly like int8 ranking noise).

Reference parity: accelerates the same candidates-iff-probed IVF
semantics (faiss IndexIVF via /root/reference/src/faiss_extension.cpp:
629-638); the spill construct itself is TPU-native (skew overflow of
the padded layout, no reference analogue).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flat_search import _NEG_INF

#: score-window width: one VPU lane group per reduced output column.
WIN = 128


def _spill_kernel(ug2_ref, qs_ref, probes_ref, asg_ref, meta_ref,
                  code_ref, wmax_ref, warg_ref, *, metric: str,
                  codec: str, has_mask: bool, nprobe: int, utile: int,
                  digit_dtype: str):
    from .sq_digits import sq_block_digit_dot

    i = pl.program_id(0)          # payload chunk; query block = grid dim 1
                                  # (inner-most, so the chunk's payload
                                  # block is fetched once per chunk)
    sim = metric == "INNER_PRODUCT"
    nq = qs_ref.shape[0]
    C = code_ref.shape[1]
    block = code_ref[0]                                # (C, w) uint8
    asg = asg_ref[0]                                   # (C,) int32
    rs_row = meta_ref[0, 0]                            # (C,) fp32
    validf = meta_ref[0, 1]                            # 1.0 live rows
    rn_row = meta_ref[0, 2] if not sim else None
    maskf = meta_ref[0, 3 if not sim else 2] if has_mask else None

    su2 = qs_ref[:, 0]
    c0 = qs_ref[:, 1]
    base_q = qs_ref[:, 2]
    mu = qs_ref[:, 3]

    for t0 in range(0, C, utile):
        ut = min(utile, C - t0)
        dot = sq_block_digit_dot(block, t0, ut, codec, dtype=digit_dtype)
        dot2 = dot(ug2_ref[...])                       # (2nq, ut)
        dot_hi = lax.slice(dot2, (0, 0), (nq, ut))
        dot_lo = lax.slice(dot2, (nq, 0), (2 * nq, ut))
        rs_t = lax.slice(rs_row, (t0,), (t0 + ut,))
        utc = su2[:, None] * (128.0 * dot_hi.astype(jnp.float32)
                              + dot_lo.astype(jnp.float32))
        uc = utc + c0[:, None] + mu[:, None] * rs_t[None, :]
        if sim:
            score = base_q[:, None] + uc
        else:
            rn_t = lax.slice(rn_row, (t0,), (t0 + ut,))
            score = -jnp.maximum(
                base_q[:, None] - 2.0 * uc + rn_t[None, :], 0.0)
        asg_t = lax.slice(asg, (t0,), (t0 + ut,))
        probed = probes_ref[:, 0:1] == asg_t[None, :]
        for j in range(1, nprobe):
            probed = jnp.logical_or(
                probed, probes_ref[:, j:j + 1] == asg_t[None, :])
        valid = jnp.logical_and(
            probed, lax.slice(validf, (t0,), (t0 + ut,))[None, :] > 0.0)
        if has_mask:
            valid = jnp.logical_and(
                valid, lax.slice(maskf, (t0,), (t0 + ut,))[None, :] > 0.0)
        score = jnp.where(valid, score, _NEG_INF)
        # per-128-lane window max + global argmax
        nw = ut // WIN
        s3 = score.reshape(nq, nw, WIN)
        wmax = jnp.max(s3, axis=2)                     # (nq, nw)
        lane3 = lax.broadcasted_iota(jnp.int32, (nq, nw, WIN), 2)
        warg_l = jnp.min(jnp.where(s3 >= wmax[:, :, None], lane3,
                                   jnp.int32(WIN)), axis=2)
        row0 = i * C + t0
        warg = row0 + lax.broadcasted_iota(
            jnp.int32, (nq, nw), 1) * WIN + jnp.minimum(warg_l, WIN - 1)
        # Outputs are (nwin, nq): the blocked window axis is the sublane
        # axis and the lane axis (nq) is whole, so the block's last dim
        # always equals the array's — Mosaic's 128-lane block rule never
        # triggers (the (nq, C//WIN) orientation statically violated it:
        # last-dim blocks of 8-16 lanes).
        w0 = t0 // WIN
        wmax_ref[w0:w0 + nw, :] = wmax.T
        warg_ref[w0:w0 + nw, :] = warg.T


def spill_chunk_ok(s_pad: int, nq: int | None = None) -> bool:
    """True iff the chunk grid this kernel would pick for ``s_pad`` rows
    yields a Mosaic-legal (C/128, qb) output block: either C >= 1024
    (8+ sublanes) or a single chunk whose block is the WHOLE output
    array.  Callers gate on this and keep odd capacities on the XLA
    scan — a 512-row chunk lowered to a 4-sublane block and failed the
    static check (filtered 8.8M, 2026-08-20).

    The single-chunk escape additionally requires the query axis to be
    unblocked (qb == nq): with nq > 256 and 128 | nq the kernel splits
    queries into blocks, so a sub-8-sublane out block is NOT the whole
    array and Mosaic rejects it (ADVICE r4).  ``nq=None`` is
    conservative — no escape."""
    c = 2048
    while s_pad % c and c > 128:
        c //= 2
    if c >= 1024:
        return True
    if s_pad != c or nq is None:
        return False
    qb = nq if nq <= 256 else (
        256 if nq % 256 == 0 else (128 if nq % 128 == 0 else nq))
    return qb == nq


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "sq", "n_used", "interpret",
                     "digit_dtype", "exact"))
def pallas_spill_search(spill_payload, spill_assign, spill_pos,
                        probe_ids, xq, mask, *, k, metric, sq,
                        sq_vmin, sq_scale, spill_rn, spill_rs,
                        n_used: int | None = None,
                        interpret: bool = False,
                        digit_dtype: str = "bf16",
                        exact: bool = True):
    """Dense Pallas spill scan.  Same output conventions as
    ivf_spill_scan: (scores (nq, k) max-oriented fp32-exact, positions
    (nq, k) int32 original-row ids, -1 missing).

    ``exact=True`` (default): rerank ALL 128 rows of each query's top
    (k+2) windows.  This is candidate-LOSSLESS for top-k: a row r in an
    unselected window has int8-score <= that window's max, and k
    selected windows each contain a row with int8-score >= it — but
    exactness holds in the INT8 score order, and the fp32 rerank is
    applied to the union, so the result matches the XLA scan's
    int8-prefilter + fp32-rerank contract row-for-row.  ``exact=False``
    keeps the cheaper window-argmax candidates (one row per window;
    two true top-k rows in one 128-row window lose one — measured
    0.999x agreement at the marco shape)."""
    from .sq import SQ_INT8_SHIFT, sq_decode, sq_query_digits
    from .sq_digits import sq_pack_query_planes, sq_utile

    if sq not in ("sq8", "sq4"):
        # sq6's digit dots need the plane-major layout the spill region
        # doesn't use; its spill stays on the XLA scan.
        raise ValueError(f"pallas_spill_search supports sq8/sq4, not {sq}")
    s_pad, w = spill_payload.shape
    nq, d = xq.shape
    nprobe = probe_ids.shape[1]
    sim = metric == "INNER_PRODUCT"

    # query digits (the padded kernels' scheme)
    if sim:
        u = xq * sq_scale[None, :]
        base = xq @ sq_vmin
    else:
        t = xq - sq_vmin[None, :]
        u = t * sq_scale[None, :]
        base = jnp.sum(t * t, axis=1)
    hi, lo, su2, mu, sum_ut = sq_query_digits(u)
    shift = float(SQ_INT8_SHIFT[sq])
    c0 = shift * sum_ut if sq == "sq8" else jnp.zeros_like(su2)
    ug2 = jnp.concatenate(
        [sq_pack_query_planes(hi, d, w, sq),
         sq_pack_query_planes(lo, d, w, sq)], axis=0)   # (2nq, wq) int8
    qscal = jnp.stack([su2, c0, base, mu], axis=1)

    # chunking: static grid over whole chunks covering n_used (pow2/16
    # rounding like ivf_spill_scan keeps recompiles O(log)).
    C = 2048
    while s_pad % C and C > WIN:
        C //= 2
    n_chunks = s_pad // C
    if n_used is not None:
        nu = int(n_used)
        gran = max(16384, (1 << max(nu.bit_length(), 1)) // 16)
        nu = -(-nu // gran) * gran
        n_chunks = min(n_chunks, -(-max(nu, 1) // C))

    # per-row meta lanes: [rs, validf, (rn for L2), (maskf)]
    lanes = [spill_rs, (spill_pos >= 0).astype(jnp.float32)]
    if not sim:
        lanes.append(spill_rn)
    has_mask = mask is not None
    if has_mask:
        lanes.append(mask.astype(jnp.float32))
    meta = jnp.stack(lanes, axis=0)                    # (L, s_pad)

    # Query blocking: in-kernel operand/score tiles scale with the query
    # count (at nq=1024 the (2nq, utile) digit-dot output alone is ~16 MB
    # — Mosaic compile OOMed on-chip 2026-08-20), so queries get their
    # own INNER grid axis of <=256-row blocks.  The payload chunk's block
    # index doesn't depend on the query axis, so Pallas fetches each
    # chunk once and sweeps the query blocks over it.
    # qb must be the whole query axis or a 128-multiple (Mosaic lane
    # rule on the output blocks); serving pads nq to pow2 buckets so
    # 256/128 always divide large batches.
    if nq <= 256:
        qb = nq
    elif nq % 256 == 0:
        qb = 256
    elif nq % 128 == 0:
        qb = 128
    else:
        qb = nq
    n_qb = nq // qb
    utile = min(C, max(WIN, sq_utile(sq, C, w, 2 * C * w + 4 * qb * w)
                       // WIN * WIN))
    nwin = n_chunks * (C // WIN)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_chunks, n_qb),
        in_specs=[
            pl.BlockSpec((2 * qb, ug2.shape[1]), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, 4), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, nprobe), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, len(lanes), C), lambda i, j: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, w), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((C // WIN, qb), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C // WIN, qb), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
    )
    kernel = functools.partial(
        _spill_kernel, metric=metric, codec=sq, has_mask=has_mask,
        nprobe=nprobe, utile=utile, digit_dtype=digit_dtype)
    # ug2 is (2nq, wq) with hi digits in rows [0, nq) and lo in [nq, 2nq)
    # — re-interleave per query block so block j holds its own hi|lo.
    ug2b = (ug2.reshape(2, n_qb, qb, -1).swapaxes(0, 1)
            .reshape(2 * nq, -1))
    wmax, warg = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nwin, nq), jnp.float32),
                   jax.ShapeDtypeStruct((nwin, nq), jnp.int32)],
        interpret=interpret,
    )(ug2b, qscal, probe_ids.astype(jnp.int32),
      spill_assign.reshape(1, s_pad),
      meta.reshape(1, len(lanes), s_pad),
      spill_payload.reshape(s_pad // C, C, w))
    wmax = wmax.T                                      # (nq, nwin)
    warg = warg.T

    # top-k_scan windows -> candidate rows -> exact fp32 rerank.
    k_req = k
    k = min(k, nwin)     # a tiny spill can have fewer windows than k
    f, add = (8, 96) if sq == "sq4" else (4, 32)
    k_scan = min(nwin, max(f * k, k + add))
    bestw, wsel = lax.top_k(wmax, k_scan)

    def exact_score(xq_b, xs_b):
        xy_b = jnp.einsum("qd,qcd->qc", xq_b, xs_b,
                          precision=lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
        if sim:
            return xy_b
        qn_b = jnp.sum(xq_b * xq_b, axis=1, keepdims=True)
        bn_b = jnp.sum(xs_b * xs_b, axis=2)
        return -jnp.maximum(qn_b - 2.0 * xy_b + bn_b, 0.0)

    kw = min(nwin, k + 2) if exact else 0
    if kw:
        # Candidate-lossless leg: ALL 128 rows of each query's top
        # (k+2) windows, gathered as contiguous window BLOCKS (~100x
        # fewer gather descriptors than row gathers) and reranked
        # fp32-exact, query-chunked so the decoded tile stays ~256 MB
        # (the chunk must scale with k: at the filtered bench's
        # binomial k'=1874 a fixed 32-query chunk was a 47 GB decode).
        wfull = wsel[:, :kw]                           # (nq, kw)
        sw = (s_pad // WIN) * WIN   # window ids < nwin <= s_pad//WIN, so
        pay_w = spill_payload[:sw].reshape(-1, WIN, w)  # a ragged tail
        asg_w = spill_assign[:sw].reshape(-1, WIN)      # is never indexed
        pos_w = spill_pos[:sw].reshape(-1, WIN)
        mask_w = mask[:sw].reshape(-1, WIN) if has_mask else None
        qc = min(nq, max(1, (1 << 26) // max(kw * WIN * d, 1)))
        while nq % qc:
            qc -= 1
        nblk = nq // qc

        def block(argsb):
            xq_b, probe_b, wf_b = argsb
            codes = pay_w[wf_b]                        # (qc, kw, WIN, w)
            xs_b = sq_decode(codes.reshape(-1, w), sq_vmin, sq_scale,
                             sq).reshape(qc, kw * WIN, d)
            s_b = exact_score(xq_b, xs_b)
            asg_b = asg_w[wf_b].reshape(qc, kw * WIN)
            ok = pos_w[wf_b].reshape(qc, kw * WIN) >= 0
            probed = probe_b[:, 0:1] == asg_b
            for j in range(1, nprobe):
                probed = jnp.logical_or(
                    probed, probe_b[:, j:j + 1] == asg_b)
            ok = jnp.logical_and(ok, probed)
            if has_mask:
                ok = jnp.logical_and(
                    ok, mask_w[wf_b].reshape(qc, kw * WIN) != 0)
            return jnp.where(ok, s_b, _NEG_INF)

        s_full = lax.map(block, (xq.reshape(nblk, qc, d),
                                 probe_ids.astype(jnp.int32)
                                 .reshape(nblk, qc, nprobe),
                                 wfull.reshape(nblk, qc, kw)))
        s_full = s_full.reshape(nq, kw * WIN)
        rows_full = (wfull[:, :, None] * WIN
                     + jnp.arange(WIN, dtype=jnp.int32)[None, None, :]
                     ).reshape(nq, kw * WIN)

    # Window-argmax leg (windows ranked kw+1..k_scan — disjoint from the
    # full-window leg, so no candidate appears twice): absorbs int8-vs-
    # fp32 ranking noise the same way ivf_spill_scan's widened k_scan
    # does.
    bw_t = bestw[:, kw:]
    cand_t = jnp.take_along_axis(warg, wsel[:, kw:], axis=1)
    safe = jnp.maximum(cand_t, 0)
    nt = k_scan - kw
    if nt:
        xs = sq_decode(spill_payload[safe.reshape(-1)], sq_vmin,
                       sq_scale, sq).reshape(nq, nt, d)
        s_t = jnp.where(jnp.isneginf(bw_t), _NEG_INF,
                        exact_score(xq, xs))
    if kw and nt:
        s2 = jnp.concatenate([s_full, s_t], axis=1)
        cand = jnp.concatenate([rows_full, cand_t], axis=1)
    elif kw:
        s2, cand = s_full, rows_full
    else:
        s2, cand = s_t, cand_t
    best, sel2 = lax.top_k(s2, k)
    rows = jnp.take_along_axis(cand, sel2, axis=1)
    pos = jnp.take(spill_pos, jnp.maximum(rows, 0))
    pos = jnp.where(jnp.isneginf(best), -1, pos)
    if k < k_req:        # pad back to the caller's k (contract parity
        pad = k_req - k  # with ivf_spill_scan)
        best = jnp.pad(best, ((0, 0), (0, pad)), constant_values=_NEG_INF)
        pos = jnp.pad(pos, ((0, 0), (0, pad)), constant_values=-1)
    return best, pos
