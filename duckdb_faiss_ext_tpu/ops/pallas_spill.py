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

    i = pl.program_id(0)
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


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "sq", "n_used", "interpret",
                     "digit_dtype"))
def pallas_spill_search(spill_payload, spill_assign, spill_pos,
                        probe_ids, xq, mask, *, k, metric, sq,
                        sq_vmin, sq_scale, spill_rn, spill_rs,
                        n_used: int | None = None,
                        interpret: bool = False,
                        digit_dtype: str = "bf16"):
    """Dense Pallas spill scan.  Same output conventions as
    ivf_spill_scan: (scores (nq, k) max-oriented fp32-exact, positions
    (nq, k) int32 original-row ids, -1 missing)."""
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

    utile = min(C, max(WIN, sq_utile(sq, C, w, 2 * C * w + 4 * nq * w)
                       // WIN * WIN))
    nwin = n_chunks * (C // WIN)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((2 * nq, ug2.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, nprobe), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, len(lanes), C), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((C // WIN, nq), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C // WIN, nq), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    kernel = functools.partial(
        _spill_kernel, metric=metric, codec=sq, has_mask=has_mask,
        nprobe=nprobe, utile=utile, digit_dtype=digit_dtype)
    wmax, warg = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nwin, nq), jnp.float32),
                   jax.ShapeDtypeStruct((nwin, nq), jnp.int32)],
        interpret=interpret,
    )(ug2, qscal, probe_ids.astype(jnp.int32),
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
    cand = jnp.take_along_axis(warg, wsel, axis=1)     # (nq, k_scan)
    safe = jnp.maximum(cand, 0)
    xs = sq_decode(spill_payload[safe.reshape(-1)], sq_vmin, sq_scale,
                   sq).reshape(nq, k_scan, d)
    xy2 = jnp.einsum("qd,qcd->qc", xq, xs,
                     precision=lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    if sim:
        s2 = xy2
    else:
        qn2 = jnp.sum(xq * xq, axis=1, keepdims=True)
        bn2 = jnp.sum(xs * xs, axis=2)
        s2 = -jnp.maximum(qn2 - 2.0 * xy2 + bn2, 0.0)
    s2 = jnp.where(jnp.isneginf(bestw), _NEG_INF, s2)
    best, sel2 = lax.top_k(s2, k)
    rows = jnp.take_along_axis(cand, sel2, axis=1)
    pos = jnp.take(spill_pos, jnp.maximum(rows, 0))
    pos = jnp.where(jnp.isneginf(best), -1, pos)
    if k < k_req:        # pad back to the caller's k (contract parity
        pad = k_req - k  # with ivf_spill_scan)
        best = jnp.pad(best, ((0, 0), (0, pad)), constant_values=_NEG_INF)
        pos = jnp.pad(pos, ((0, 0), (0, pad)), constant_values=-1)
    return best, pos
