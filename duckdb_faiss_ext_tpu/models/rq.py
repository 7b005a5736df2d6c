"""Residual-quantizer index model (faiss::IndexResidualQuantizer surface).

Factory strings ``RQ{M}x{b}`` reach faiss's additive residual quantizer
through the reference's verbatim index_factory pass-through
(src/faiss_extension.cpp:154-155).  Shares PQIndex's whole execution
shape — uint8 codes on device, fused decode+distance+top-k scan — only
the codec differs: full-dimension stage codebooks whose codewords SUM to
the reconstruction (ops/rq.py), encoded with batched beam search.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .. import errors
from ..metrics import Metric
from ..ops.flat_search import choose_chunk, finalize_scores
from ..ops.rq import rq_decode, rq_encode, rq_train
from ..params import EMPTY
from ..utils.config import config, next_pow2, pad_rows
from .base import as_matrix
from .pq import PQIndex

#: beam width for encoding (faiss ResidualQuantizer default beam is wider;
#: 4 keeps ingest one matmul per stage per 4 candidates and recovers most
#: of the quantization error vs greedy).
DEFAULT_BEAM = 4


class RQIndex(PQIndex):
    def __init__(self, d: int, metric: Metric, metric_arg: float = 0.0,
                 M: int = 8, nbits: int = 8):
        # Skip PQIndex.__init__'s d % M requirement: RQ stages are
        # full-dimension, any (d, M) combination is valid.
        if metric.name not in ("L2", "INNER_PRODUCT"):
            raise errors.InvalidInputError(
                f"RQ indexes support only L2 and INNER_PRODUCT metrics, "
                f"got {metric.name}")
        super(PQIndex, self).__init__(d, metric, metric_arg)
        from ..ops.kmeans import DEFAULT_SEED

        self.M = int(M)
        self.nbits = int(nbits)
        self.ksub = 1 << int(nbits)
        self.beam = DEFAULT_BEAM
        self.train_seed = DEFAULT_SEED
        self._codebooks = None          # (M, ksub, d)
        self._codes = np.empty((0, M), dtype=np.uint8)
        self._version = 0
        self._device = None
        self._mask_cache: dict = {}

    def apply_create_params(self, params) -> None:
        super().apply_create_params(params)
        b = params.get_int("beam")
        if b is not None:
            self.beam = max(1, b)

    def train(self, x) -> None:
        if self.is_trained:
            return
        x = as_matrix(x, self.d)
        if x.shape[0] < self.ksub:
            raise errors.TrainingTooSmallError(x.shape[0], self.ksub)
        self._codebooks = np.asarray(
            rq_train(x, self.M, self.ksub, seed=self.train_seed,
                     precision=config.precision), dtype=np.float32)
        self._invalidate()

    def add(self, x) -> None:
        if not self.is_trained:
            raise errors.InvalidInputError(
                "Index is not trained; call train (or faiss_manual_train) "
                "before adding or searching")
        x = as_matrix(x, self.d)
        if x.shape[0] == 0:
            return
        codes = np.asarray(rq_encode(jnp.asarray(x),
                                     jnp.asarray(self._codebooks),
                                     beam=self.beam,
                                     precision=config.precision))
        self._codes = np.concatenate([self._codes, codes], axis=0)
        self._invalidate()

    def reconstruct(self, key: int) -> np.ndarray:
        return np.asarray(rq_decode(jnp.asarray(self._codes[key:key + 1]),
                                    jnp.asarray(self._codebooks)))[0]

    def search_dispatch(self, xq, k, params=EMPTY, selector=None):
        """Same fused scan as PQ with the additive decoder."""
        from ..ops.pq import pq_search

        if not self.is_trained:
            raise errors.InvalidInputError(
                "Index is not trained; call train (or faiss_manual_train) "
                "before adding or searching")
        xq = as_matrix(xq, self.d)
        nq = xq.shape[0]
        k = int(k)
        if nq == 0 or k <= 0:
            return None
        codes_dev, cb_dev = self._device_state()
        cap = codes_dev.shape[0]
        k_eff = min(k, cap)
        nq_pad = max(config.min_query_bucket, next_pow2(nq))
        xq_pad = jnp.asarray(pad_rows(xq, nq_pad))
        mask = None
        if selector is not None:
            key = (selector.cache_key(), self._version)
            mask = self._mask_cache.get(key)
            if mask is None:
                rows = selector.contains(self.row_labels())
                mask = jnp.asarray(pad_rows(rows, cap, fill=False))
                self._mask_cache = {key: mask}
        chunk = choose_chunk(cap, nq_pad, self.d, self.metric.name)
        scores, pos = pq_search(
            codes_dev, jnp.int32(self.ntotal), cb_dev, xq_pad, mask,
            jnp.asarray(self.metric_arg, jnp.float32),
            k=k_eff, metric=self.metric.name, chunk=chunk,
            precision=config.precision, codec="rq")
        dist, pos = finalize_scores(scores, pos, self.metric.name)
        return dist, pos, nq, k_eff

    def state_dict(self) -> dict:
        state = super().state_dict()
        state["rq_meta"] = np.array([self.beam])
        return state

    def load_state(self, state: dict) -> None:
        meta = state.pop("rq_meta", None)
        if meta is not None:
            self.beam = int(meta[0])
        self._codes = np.asarray(state["codes"],
                                 np.uint8).reshape(-1, self.M)
        cb = state.get("codebooks")
        self._codebooks = (np.asarray(cb, np.float32)
                           if cb is not None else None)
        self._invalidate()


def _rq_range_search(self, xq, radius, params=None, selector=None):
    from ..ops.range import (_range_tile_pq, choose_range_chunk,
                             empty_range_result, range_num_chunks,
                             range_scan_dense)

    if not self.is_trained:
        raise errors.InvalidInputError(
            "Index is not trained; call train (or faiss_manual_train) "
            "before adding or searching")
    xq = as_matrix(xq, self.d)
    nq = xq.shape[0]
    if nq == 0 or self.ntotal == 0:
        return empty_range_result(nq)
    codes_dev, cb_dev = self._device_state()
    cap = codes_dev.shape[0]
    chunk = choose_range_chunk(cap)
    nq_pad = max(config.min_query_bucket, next_pow2(nq))
    xq_dev = jnp.asarray(pad_rows(xq, nq_pad))
    marg = jnp.asarray(self.metric_arg, jnp.float32)
    passing = (selector.contains(self.row_labels())
               if selector is not None else None)

    def get_tile(i):
        return _range_tile_pq(codes_dev[i * chunk:(i + 1) * chunk], cb_dev,
                              xq_dev, marg, metric=self.metric.name,
                              precision=config.precision, codec="rq")

    return range_scan_dense(get_tile, range_num_chunks(cap, chunk), chunk,
                            self.ntotal, nq, float(radius),
                            self.metric.name, passing)


RQIndex.range_search = _rq_range_search
