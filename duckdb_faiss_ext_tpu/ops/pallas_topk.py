"""Pallas TPU kernel: fused distance + top-k for L2 / inner product.

The hot op of the engine (the reference's ``Index::search`` BLAS+heap path,
src/faiss_extension.cpp:629-638) as a single TPU kernel: corpus tiles stream
HBM→VMEM (auto double-buffered by the Pallas pipeline), scores are computed
on the MXU, and a running top-k candidate set lives in VMEM scratch across
corpus tiles — the (Q, N) score matrix never exists, in HBM or anywhere.

Top-k algorithm (sort-free, VPU-friendly):
* scratch holds KP ≥ k unsorted candidate slots per query (KP = k rounded up
  to the 128-lane width);
* per corpus tile, K extract passes: row-argmax of the tile, then the
  extracted value replaces the current *minimum* slot when it beats it;
* exactness: an element of the true top-k can never be evicted — eviction
  requires KP ≥ k strictly larger candidates, contradicting membership.
  (Ties may reorder vs. the XLA path; slot order is resolved by a final
  host-side sort in the wrapper.)

The kernel returns the unsorted candidate set; ``pallas_flat_search`` sorts
(score desc, position asc) and slices to k.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float("-inf")


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _topk_kernel(nvalid_ref, xq_ref, xb_ref, mask_ref, outd_ref, outp_ref,
                 bs_ref, bp_ref, *, k: int, nt: int, metric: str, precision,
                 has_mask: bool):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        # Exactly k live slots: the remaining lane-padding slots start at
        # +inf so argmin never selects them and the running minimum equals
        # the true k-th best — the tile-skip threshold stays tight.
        qt_, kp_ = bs_ref.shape
        kl = lax.broadcasted_iota(jnp.int32, (qt_, kp_), 1)
        bs_ref[:] = jnp.where(kl < k, _NEG_INF, jnp.inf).astype(bs_ref.dtype)
        bp_ref[:] = jnp.full(bp_ref.shape, -1, bp_ref.dtype)

    xq = xq_ref[:]                     # (qt, d)
    xb = xb_ref[:]                     # (nt, d)
    if metric == "INNER_PRODUCT":
        scores = jnp.dot(xq, xb.T, precision=precision,
                         preferred_element_type=jnp.float32)
    else:  # L2 (negated so the kernel always maximises)
        xy = jnp.dot(xq, xb.T, precision=precision,
                     preferred_element_type=jnp.float32)
        qn = jnp.sum(xq * xq, axis=1, keepdims=True)
        bn = jnp.sum(xb * xb, axis=1)[None, :]
        scores = -jnp.maximum(qn - 2.0 * xy + bn, 0.0)

    qt = scores.shape[0]
    rowid = j * nt + lax.broadcasted_iota(jnp.int32, (qt, nt), 1)
    valid = rowid < nvalid_ref[0, 0]
    if has_mask:
        valid = jnp.logical_and(valid, mask_ref[:] != 0)
    scores = jnp.where(valid, scores, _NEG_INF)

    lane = lax.broadcasted_iota(jnp.int32, (qt, nt), 1)
    kp = bs_ref.shape[1]
    klane = lax.broadcasted_iota(jnp.int32, (qt, kp), 1)

    # Tile skip: once the running top-k stabilises, most corpus tiles hold
    # nothing that beats any query's current k-th best — one cheap max
    # reduction decides, and the k insert passes (the latency-bound part)
    # are skipped entirely for such tiles.
    tile_max = jnp.max(scores, axis=1)                         # (qt,)
    cur_min = jnp.min(bs_ref[:], axis=1)                       # (qt,)
    any_improves = jnp.any(tile_max > cur_min)

    @pl.when(any_improves)
    def _insert():
        def insert_pass(_, state):
            s, bs, bp = state
            m = jnp.max(s, axis=1, keepdims=True)                  # (qt, 1)
            a = jnp.argmax(s, axis=1).astype(jnp.int32)[:, None]   # (qt, 1)
            s = jnp.where(lane == a, _NEG_INF, s)
            bmin = jnp.min(bs, axis=1, keepdims=True)
            bam = jnp.argmin(bs, axis=1).astype(jnp.int32)[:, None]
            take = jnp.logical_and(klane == bam, m > bmin)
            bs = jnp.where(take, m, bs)
            bp = jnp.where(take, j * nt + a, bp)
            return s, bs, bp

        _, bs, bp = lax.fori_loop(
            0, k, insert_pass, (scores, bs_ref[:], bp_ref[:]))
        bs_ref[:] = bs
        bp_ref[:] = bp

    @pl.when(j == nj - 1)
    def _emit():
        # Unused (+inf) and never-filled slots carry bp = -1 → emit -inf so
        # the host-side sort ranks them last.
        outd_ref[:] = jnp.where(bp_ref[:] < 0, _NEG_INF, bs_ref[:])
        outp_ref[:] = bp_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "qt", "nt", "precision", "interpret"),
)
def _pallas_topk(xb, nvalid, xq, mask, *, k, metric, qt, nt, precision,
                 interpret=False):
    cap, d = xb.shape
    nq = xq.shape[0]
    kp = _round_up(max(k, 1), 128)
    grid = (nq // qt, cap // nt)

    in_specs = [
        pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((qt, d), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nt, d), lambda i, j: (j, 0),
                     memory_space=pltpu.VMEM),
    ]
    has_mask = mask is not None
    args = [jnp.asarray(nvalid, jnp.int32).reshape(1, 1), xq, xb]
    if has_mask:
        in_specs.append(pl.BlockSpec((1, nt), lambda i, j: (0, j),
                                     memory_space=pltpu.VMEM))
        args.append(mask.astype(jnp.int8).reshape(1, cap))
    else:
        in_specs.append(pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                                     memory_space=pltpu.SMEM))
        args.append(jnp.zeros((1, 1), jnp.int32))

    kernel = functools.partial(
        _topk_kernel, k=k, nt=nt, metric=metric, precision=precision,
        has_mask=has_mask)

    outd, outp = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((qt, kp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, kp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq, kp), jnp.float32),
            jax.ShapeDtypeStruct((nq, kp), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((qt, kp), jnp.float32),
            pltpu.VMEM((qt, kp), jnp.int32),
        ],
        interpret=interpret,
    )(*args)

    # Sort candidate slots: score desc, then position asc for deterministic
    # tie order; slice to k.
    order_key = jnp.where(outp < 0, jnp.iinfo(jnp.int32).max, outp)
    neg, _, idx = lax.sort((-outd, order_key, outp), num_keys=2)
    return (-neg)[:, :k], idx[:, :k]


def supports(metric: str, k: int, d: int) -> bool:
    return metric in ("INNER_PRODUCT", "L2") and 1 <= k <= 1024 and d >= 1


def choose_tiles(nq: int, cap: int, d: int, k: int):
    """(qt, nt): maximise per-step work — the grid machinery costs
    ~7-12 µs per step regardless of body (tools/mxu_probe.py), so at
    1M×128 b1024 the old (128, 2048) tiling's 4096 steps burned ~30-50
    ms of pure step overhead against a ~5 ms fp32-MXU floor (measured
    via tools/serve_profile.py corpus-scaling, 2026-08-20).  Budget:
    qt·d (queries) + 2·qt·kp·2 (top-k scratch) ≲ 4 MB; 2·nt·d
    (double-buffered corpus blocks) + qt·nt (score tile) ≲ 8 MB."""
    # qt stays small: the tile-skip predicate is ANY-query-improves, so
    # wide query tiles skip almost never and pay k insert passes on
    # every tile (qt=1024 measured 131 ms vs 92 ms at 1M×128 b1024 —
    # 2026-08-20).  Only the corpus tile grows to cut step count.
    qt = min(nq, 128)
    nt = 4096
    while nt > 128 and 2 * nt * d * 4 + qt * nt * 4 > (8 << 20):
        nt //= 2
    while qt > 8 and qt * (d + nt) * 4 > (4 << 20):
        qt //= 2
    return qt, min(nt, cap)


def pallas_flat_search(xb_pad, nvalid, xq_pad, k, metric,
                       mask=None, precision=lax.Precision.DEFAULT,
                       interpret=False):
    """Fused Pallas search over a padded corpus buffer.  Same contract as
    ops.flat_search.flat_search (distances with FAISS sentinels, positions
    -1 when missing) for L2/INNER_PRODUCT."""
    cap, d = xb_pad.shape
    nq = xq_pad.shape[0]
    qt, nt = choose_tiles(nq, cap, d, k)
    # nq and cap are powers of two ≥ the tile sizes by construction.
    scores, pos = _pallas_topk(xb_pad, nvalid, xq_pad, mask,
                               k=k, metric=metric, qt=qt, nt=nt,
                               precision=precision, interpret=interpret)
    from .flat_search import finalize_scores

    return finalize_scores(scores, pos, metric)
