"""Pallas TPU kernel: IVF inverted-list scan via scalar-prefetched DMA.

The gather-based IVF scan (ops/ivf_scan.py) is bottlenecked by XLA's row
gather — TPUs hate data-dependent row addressing.  This kernel exploits the
structure XLA can't see: an inverted list is a *contiguous block*.  Lists
are stored padded as (nlist, lmax, d); the grid walks (query, probe) pairs
and a scalar-prefetched probe table drives the BlockSpec index map, so the
Pallas pipeline DMAs exactly the probed list blocks HBM→VMEM, double-
buffered across grid steps (this is the PrefetchScalarGridSpec pattern from
the TPU kernel playbook).

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


def _scan_kernel(pids_ref, counts_ref, xq_ref, list_ref, out_ref,
                 *, nprobe: int, metric: str, has_mask: bool,
                 mask_ref=None):
    i = pl.program_id(0)
    j = pl.program_id(1)
    lid = pids_ref[i * nprobe + j]
    cnt = counts_ref[lid]

    q = xq_ref[0, 0, :]              # (d,)
    block = list_ref[0]              # (lmax, d)
    if metric == "INNER_PRODUCT":
        s = jnp.sum(block * q[None, :], axis=1)      # (lmax,)
    else:  # L2 (negated: kernel output is max-oriented)
        diff = block - q[None, :]
        s = -jnp.sum(diff * diff, axis=1)
    lmax = block.shape[0]
    lane = lax.broadcasted_iota(jnp.int32, (1, lmax), 1)[0]
    valid = lane < cnt
    if has_mask:
        valid = jnp.logical_and(valid, mask_ref[0, 0] != 0)
    out_ref[0, 0, 0, :] = jnp.where(valid, s, _NEG_INF)


def _kernel_with_mask(pids_ref, counts_ref, xq_ref, list_ref, mask_ref,
                      out_ref, *, nprobe, metric):
    _scan_kernel(pids_ref, counts_ref, xq_ref, list_ref, out_ref,
                 nprobe=nprobe, metric=metric, has_mask=True,
                 mask_ref=mask_ref)


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

    # Mosaic requires block dims to be tile-divisible or equal to the
    # array dim — singleton axes satisfy the latter for per-row blocks.
    in_specs = [
        pl.BlockSpec((1, 1, d), lambda i, j, pids, cnts: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, lmax, d),
            lambda i, j, pids, cnts: (pids[i * nprobe + j], 0, 0),
            memory_space=pltpu.VMEM),
    ]
    args = [probe_ids.reshape(-1).astype(jnp.int32),
            counts.astype(jnp.int32), xq.reshape(nq, 1, d), xb_lists]
    if mask is not None:
        in_specs.append(pl.BlockSpec(
            (1, 1, lmax),
            lambda i, j, pids, cnts: (pids[i * nprobe + j], 0, 0),
            memory_space=pltpu.VMEM))
        args.append(mask.reshape(nlist, 1, lmax))
        kernel = functools.partial(_kernel_with_mask, nprobe=nprobe,
                                   metric=metric)
    else:
        kernel = functools.partial(_scan_kernel, nprobe=nprobe,
                                   metric=metric, has_mask=False)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nq, nprobe),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, 1, lmax),
                               lambda i, j, pids, cnts: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    scores = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nq, nprobe, 1, lmax), jnp.float32),
        interpret=interpret,
    )(*args)

    flat = scores.reshape(nq, nprobe * lmax)
    best, sel = lax.top_k(flat, k)                      # (nq, k)
    # Resolve positions: sel → (probe slot, lane) → list id → original row.
    probe_slot = sel // lmax
    lane = sel % lmax
    lids = jnp.take_along_axis(probe_ids, probe_slot, axis=1)  # (nq, k)
    pos = row_pos[lids, lane]
    pos = jnp.where(jnp.isneginf(best), -1, pos)
    return best, pos


def choose_lmax(counts_max: int) -> int:
    """Pad list length: power of two ≥ max list size, ≥ 128 lanes."""
    lmax = 128
    while lmax < counts_max:
        lmax *= 2
    return lmax
