"""Fused brute-force k-NN search: chunked distance scan + running top-k.

TPU-native replacement for the reference's hot path — ``Index::search`` under
``faiss_lock`` (src/faiss_extension.cpp:629-638), which in FAISS is a BLAS
GEMM plus a per-query heap select.  Here the corpus streams through the MXU in
chunks while a running top-k merge stays on-chip; XLA fuses the masking and
the merge into the scan body so the full (Q, N) distance matrix never
materialises in HBM.

Semantics mirrored from FAISS:
* Results are sorted best-first ("rank" order in the output schema).
* Fewer than k valid candidates → position -1 and a sentinel distance
  (+inf for distance metrics, -inf for similarity metrics).
* Similarity metrics (INNER_PRODUCT, Jaccard) select max; others select min.

Layering: ``search_scan`` is the raw scan over one (local) corpus buffer,
returning max-oriented scores (-inf = missing) so shard results can be merged
with one more top-k; ``finalize_scores`` converts merged scores to the
distance/sentinel convention.  ``flat_search`` is the jitted single-buffer
path used by FlatIndex; parallel/sharded.py composes the same scan under
shard_map with an all-gather merge.

An optional ``mask`` (bool per corpus row) implements filtered search as a
semi-join fused into the scan — the TPU equivalent of FAISS's IDSelector
consulted inside scan loops (src/faiss_extension.cpp:959,1008).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .distance import pairwise_tile

# Metrics where larger is better (FAISS is_similarity_metric).
SIMILARITY_METRICS = frozenset({"INNER_PRODUCT", "Jaccard"})

_NEG_INF = float("-inf")


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def choose_chunk(cap: int, nq: int, d: int, metric: str) -> int:
    """Corpus rows per scan step.  Bounds the live tile so the fused body stays
    on-chip: (nq × chunk) fp32 scores for MXU metrics, plus the (nq × chunk × d)
    broadcast for elementwise metrics.  Returns a power of two dividing cap
    (cap is always a power of two ≥ 128)."""
    if metric in ("INNER_PRODUCT", "L2"):
        budget = max(512, (1 << 22) // max(nq, 1))
    else:
        budget = max(128, (1 << 24) // max(nq * d, 1))
    return min(cap, _next_pow2(min(budget, 1 << 16)))


def search_scan(xb, nvalid, xq, mask, metric_arg, row_offset,
                *, k, metric, chunk, precision):
    """Scan a (cap, d) corpus buffer; return (scores (nq, k), positions
    (nq, k) int32).  Scores are max-oriented (negated distances for min
    metrics) with -inf marking missing slots; positions are global
    (``row_offset`` + local row).  ``nvalid`` bounds the *global* row id, so a
    shard at offset o with local capacity c holds valid rows while
    o + local < nvalid."""
    cap, d = xb.shape
    nq = xq.shape[0]
    nchunks = cap // chunk
    sim = metric in SIMILARITY_METRICS

    def body(i, carry):
        best_score, best_pos = carry
        start = i * chunk
        xc = lax.dynamic_slice(xb, (start, 0), (chunk, d))
        dist = pairwise_tile(xq, xc, metric, metric_arg, precision)
        rowid = row_offset + start + lax.broadcasted_iota(
            jnp.int32, (1, chunk), 1)
        valid = rowid < nvalid
        if mask is not None:
            mc = lax.dynamic_slice(mask, (start,), (chunk,))
            valid = jnp.logical_and(valid, mc[None, :])
        score = dist if sim else -dist
        score = jnp.where(valid, score, _NEG_INF)
        # Merge: carry slots come first so earlier chunks win ties (top_k
        # prefers lower index on equal values) — deterministic rank order.
        cat_s = jnp.concatenate([best_score, score], axis=1)
        cat_p = jnp.concatenate(
            [best_pos, jnp.broadcast_to(rowid, (nq, chunk))], axis=1)
        new_s, sel = lax.top_k(cat_s, k)
        new_p = jnp.take_along_axis(cat_p, sel, axis=1)
        return new_s, new_p

    init = (
        jnp.full((nq, k), _NEG_INF, jnp.float32),
        jnp.full((nq, k), -1, jnp.int32),
    )
    return lax.fori_loop(0, nchunks, body, init)


def finalize_scores(scores, positions, metric):
    """Convert max-oriented scores to the output distance convention with
    FAISS sentinels for missing slots."""
    sim = metric in SIMILARITY_METRICS
    missing = jnp.isneginf(scores)
    dist = scores if sim else -scores
    sentinel = _NEG_INF if sim else float("inf")
    dist = jnp.where(missing, sentinel, dist)
    positions = jnp.where(missing, -1, positions)
    return dist, positions


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "chunk", "precision"),
)
def _flat_search(xb, nvalid, xq, mask, metric_arg, *, k, metric, chunk,
                 precision):
    scores, pos = search_scan(
        xb, nvalid, xq, mask, metric_arg, jnp.int32(0),
        k=k, metric=metric, chunk=chunk, precision=precision)
    return finalize_scores(scores, pos, metric)


def flat_search(
    xb_pad: jax.Array,      # (cap, d) fp32, cap a power of two
    nvalid,                 # scalar int32: valid rows in xb_pad
    xq_pad: jax.Array,      # (nq_pad, d) fp32
    k: int,
    metric: str,
    metric_arg: float = 0.0,
    mask: jax.Array | None = None,  # (cap,) bool or None
    precision=lax.Precision.HIGHEST,
):
    """Fused search over a padded corpus.  Returns (distances (nq_pad, k) fp32,
    positions (nq_pad, k) int32; -1 where fewer than k candidates)."""
    cap, d = xb_pad.shape
    if k > cap:
        raise ValueError(f"k={k} exceeds padded capacity {cap}; caller must clamp")
    chunk = choose_chunk(cap, xq_pad.shape[0], d, metric)
    return _flat_search(
        xb_pad,
        jnp.asarray(nvalid, jnp.int32),
        xq_pad,
        mask,
        jnp.asarray(metric_arg, jnp.float32),
        k=k,
        metric=metric,
        chunk=chunk,
        precision=precision,
    )
