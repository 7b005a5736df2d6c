"""Scalar-quantizer codecs: SQ8 (uint8 per dim) and SQfp16.

Equivalent of faiss::IndexScalarQuantizer as reachable through factory
strings (``SQ8``, ``SQfp16``).  SQ8 trains per-dimension [vmin, vmax] ranges
(FAISS's RS_minmax default) and stores one byte per dimension; search
decodes chunks on the fly and rides the same MXU distance tile as Flat —
the same TPU-first decode-don't-LUT design as ops/pq.py, at 4× (SQ8) or 2×
(fp16) less HBM traffic than fp32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .distance import pairwise_tile
from .flat_search import _NEG_INF, SIMILARITY_METRICS


def sq8_train(x) -> tuple[jax.Array, jax.Array]:
    """Per-dim (vmin (d,), scale (d,)) from training data."""
    x = jnp.asarray(x, jnp.float32)
    vmin = jnp.min(x, axis=0)
    vmax = jnp.max(x, axis=0)
    scale = jnp.maximum(vmax - vmin, 1e-20) / 255.0
    return vmin, scale


@jax.jit
def sq8_encode(x, vmin, scale):
    q = jnp.round((jnp.asarray(x, jnp.float32) - vmin[None, :])
                  / scale[None, :])
    return jnp.clip(q, 0, 255).astype(jnp.uint8)


def sq8_decode(codes, vmin, scale):
    return codes.astype(jnp.float32) * scale[None, :] + vmin[None, :]


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "chunk", "precision", "codec"))
def sq_search(codes, nvalid, vmin, scale, xq, mask, metric_arg, *, k, metric,
              chunk, precision, codec="sq8"):
    """Fused decode+distance+top-k scan over quantized codes.

    codes: (cap, d) uint8 (sq8) or float16 (fp16); same output conventions
    as flat_search."""
    cap, d = codes.shape
    nq = xq.shape[0]
    sim = metric in SIMILARITY_METRICS

    def body(i, carry):
        best_s, best_p = carry
        start = i * chunk
        cchunk = lax.dynamic_slice(codes, (start, 0), (chunk, d))
        if codec == "sq8":
            xc = sq8_decode(cchunk, vmin, scale)
        else:
            xc = cchunk.astype(jnp.float32)
        dist = pairwise_tile(xq, xc, metric, metric_arg, precision)
        rowid = start + lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        valid = rowid < nvalid
        if mask is not None:
            mc = lax.dynamic_slice(mask, (start,), (chunk,))
            valid = jnp.logical_and(valid, mc[None, :])
        score = dist if sim else -dist
        score = jnp.where(valid, score, _NEG_INF)
        cat_s = jnp.concatenate([best_s, score], axis=1)
        cat_p = jnp.concatenate(
            [best_p, jnp.broadcast_to(rowid, (nq, chunk))], axis=1)
        new_s, sel = lax.top_k(cat_s, k)
        return new_s, jnp.take_along_axis(cat_p, sel, axis=1)

    init = (jnp.full((nq, k), _NEG_INF, jnp.float32),
            jnp.full((nq, k), -1, jnp.int32))
    return lax.fori_loop(0, cap // chunk, body, init)
