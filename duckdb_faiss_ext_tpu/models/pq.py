"""PQ index model: trained codebooks + uint8 codes, fused decode-scan search.

Equivalent of faiss::IndexPQ (factory ``PQm[xb]``; SearchParametersPQ
defaults, src/faiss_extension.cpp:704-708).  Like FAISS, only the true
vector-compression path is stored — codes, not raw vectors; ``reconstruct``
returns the decoded approximation.  Metrics: L2 and INNER_PRODUCT (FAISS
IndexPQ likewise supports only these two for ADC search).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .. import errors
from ..metrics import Metric
from ..ops.flat_search import choose_chunk, finalize_scores
from ..ops.kmeans import DEFAULT_SEED
from ..ops.pq import pq_decode, pq_encode, pq_search, pq_train
from ..params import EMPTY
from ..utils.config import (config, next_capacity, next_pow2,
                            pad_rows)
from ..utils.transfer import upload_queries
from .base import Index, SearchResult, as_matrix


class PQIndex(Index):
    #: decoder for the stored byte codes — "pq" (subspace concat) or "rq"
    #: (additive sum; RQIndex overrides).  Consumed by the shared
    #: search/range paths via ops/pq.codec_* switches.
    codec = "pq"
    #: class defaults so subclasses that bypass __init__ (RQIndex) still
    #: behave (serialization / placement).
    aniso_eta = 1.0
    _placement = None

    def __init__(self, d: int, metric: Metric, metric_arg: float = 0.0,
                 M: int = 8, nbits: int = 8):
        super().__init__(d, metric, metric_arg)
        if d % M != 0:
            raise errors.InvalidInputError(
                f"The dimension of the vector ({d}) must be a multiple of "
                f"the number of subquantizers ({M})")
        if metric.name not in ("L2", "INNER_PRODUCT"):
            raise errors.InvalidInputError(
                f"PQ indexes support only L2 and INNER_PRODUCT metrics, "
                f"got {metric.name}")
        self.M = int(M)
        self.nbits = int(nbits)
        self.ksub = 1 << int(nbits)
        #: ScaNN-style score-aware loss weight (anisotropic_eta create
        #: param): > 1 penalises the score-shifting parallel residual more
        #: during training AND encoding; 1.0 is plain k-means/nearest.
        self.aniso_eta = 1.0
        self.train_seed = DEFAULT_SEED
        self._codebooks: np.ndarray | None = None   # (M, ksub, dsub)
        self._codes = np.empty((0, M), dtype=np.uint8)
        self._version = 0
        self._device = None
        self._placement = None
        self._mask_cache: dict = {}

    @property
    def ntotal(self) -> int:
        return self._codes.shape[0]

    @property
    def is_trained(self) -> bool:
        return self._codebooks is not None

    @property
    def requires_training(self) -> bool:
        return True

    def apply_create_params(self, params) -> None:
        super().apply_create_params(params)
        eta = params.get_float("anisotropic_eta")
        if eta is not None:
            if eta < 1.0:
                raise errors.InvalidInputError(
                    f"anisotropic_eta must be >= 1.0, got {eta}")
            self.aniso_eta = eta

    def train(self, x) -> None:
        if self.is_trained:
            return
        x = as_matrix(x, self.d)
        if x.shape[0] < self.ksub:
            raise errors.TrainingTooSmallError(x.shape[0], self.ksub)
        if self.aniso_eta > 1.0:
            from ..ops.pq import pq_train_anisotropic

            cb = pq_train_anisotropic(x, self.M, self.ksub, self.aniso_eta,
                                      seed=self.train_seed,
                                      precision=config.precision)
        else:
            cb = pq_train(x, self.M, self.ksub, seed=self.train_seed,
                          precision=config.precision)
        self._codebooks = np.asarray(cb, dtype=np.float32)
        self._invalidate()

    def add(self, x) -> None:
        if not self.is_trained:
            raise errors.InvalidInputError(
                "Index is not trained; call train (or faiss_manual_train) "
                "before adding or searching")
        x = as_matrix(x, self.d)
        if x.shape[0] == 0:
            return
        if self.aniso_eta > 1.0:
            from ..ops.pq import pq_encode_anisotropic

            codes = np.asarray(pq_encode_anisotropic(
                jnp.asarray(x), jnp.asarray(self._codebooks),
                jnp.float32(self.aniso_eta), precision=config.precision))
        else:
            codes = np.asarray(pq_encode(jnp.asarray(x),
                                         jnp.asarray(self._codebooks),
                                         precision=config.precision))
        self._codes = np.concatenate([self._codes, codes], axis=0)
        self._invalidate()

    def reconstruct(self, key: int) -> np.ndarray:
        return np.asarray(pq_decode(jnp.asarray(self._codes[key:key + 1]),
                                    jnp.asarray(self._codebooks)))[0]

    def _invalidate(self):
        self._version += 1
        self._device = None
        self._mask_cache.clear()

    def _capacity(self) -> int:
        from .base import placement_capacity

        return placement_capacity(
            max(config.min_capacity, next_capacity(max(self.ntotal, 1))),
            self._placement)

    def _device_state(self):
        if self._device is None:
            cap = self._capacity()
            codes = pad_rows(self._codes, cap)
            if self._placement is not None:
                import jax

                codes_dev = jax.device_put(codes, self._placement)
            else:
                codes_dev = jnp.asarray(codes)
            self._device = (codes_dev, jnp.asarray(self._codebooks))
        return self._device

    def shard_over(self, mesh) -> None:
        """faiss_to_gpu analogue: byte codes row-sharded over the mesh,
        codebooks replicated; the fused decode+scan partitions under
        GSPMD like the Flat path (models/flat.py _dispatch_search)."""
        from .base import row_placement

        self._placement = row_placement(mesh)
        self._device = None
        self._mask_cache.clear()
        if self.is_trained:
            # Untrained indexes have no codebooks yet; the placement is
            # sticky, materialization happens on the first post-train use
            # (faiss_to_gpu before training is a standard FAISS flow).
            self._device_state()

    def search(self, xq, k, params=EMPTY, selector=None) -> SearchResult:
        return self._finish_dispatch(
            self.search_dispatch(xq, k, params, selector), xq, k)

    def search_dispatch(self, xq, k, params=EMPTY, selector=None):
        """Raw device dispatch for the single-fetch serving tier."""
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
        xq_pad = upload_queries(pad_rows(xq, nq_pad), lossy_ok=True)
        mask = None
        if selector is not None:
            key = (selector.cache_key(), self._version)
            mask = self._mask_cache.get(key)
            if mask is None:
                rows = selector.contains(self.row_labels())
                mask = jnp.asarray(pad_rows(rows, cap, fill=False))
                self._mask_cache = {key: mask}
        chunk = choose_chunk(cap, nq_pad, self.d, self.metric.name)
        # pq_search loops cap // chunk steps: clamp to the largest
        # power-of-two divisor of cap (1M-step capacities above 2^20 rows
        # are not powers of two) so no tail rows are skipped.
        chunk = min(chunk, cap & -cap)
        if cap % chunk:
            chunk = cap

        scores, pos = pq_search(
            codes_dev, jnp.int32(self.ntotal), cb_dev, xq_pad, mask,
            jnp.asarray(self.metric_arg, jnp.float32),
            k=k_eff, metric=self.metric.name, chunk=chunk,
            precision=config.precision, codec=self.codec)
        dist, pos = finalize_scores(scores, pos, self.metric.name)
        return dist, pos, nq, k_eff

    def state_dict(self) -> dict:
        state = {"codes": self._codes}
        if self._codebooks is not None:
            state["codebooks"] = self._codebooks
        if self.aniso_eta > 1.0:
            state["aniso_eta"] = np.float32(self.aniso_eta)
        return state

    def load_state(self, state: dict) -> None:
        eta = state.pop("aniso_eta", None)
        if eta is not None:
            self.aniso_eta = float(eta)
        self._codes = np.asarray(state["codes"], np.uint8).reshape(-1, self.M)
        cb = state.get("codebooks")
        self._codebooks = (np.asarray(cb, np.float32)
                           if cb is not None else None)
        self._invalidate()


def _pq_range_search(self, xq, radius, params=None, selector=None):
    from ..ops.range import (_range_tile_pq, choose_range_chunk, range_num_chunks,
                             empty_range_result, range_scan_dense)

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
                              precision=config.precision, codec=self.codec)

    return range_scan_dense(get_tile, range_num_chunks(cap, chunk), chunk, self.ntotal, nq,
                            float(radius), self.metric.name, passing)


PQIndex.range_search = _pq_range_search
