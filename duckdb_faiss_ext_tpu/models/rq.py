"""Residual-quantizer index model (faiss::IndexResidualQuantizer surface).

Factory strings ``RQ{M}x{b}`` reach faiss's additive residual quantizer
through the reference's verbatim index_factory pass-through
(src/faiss_extension.cpp:154-155).  Shares PQIndex's whole execution
shape — uint8 codes on device, fused decode+distance+top-k scan (the
``codec`` switch in ops/pq.py selects the additive decoder) — only the
codec training/encoding differ: full-dimension stage codebooks whose
codewords SUM to the reconstruction, encoded with batched beam search.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .. import errors
from ..metrics import Metric
from ..ops.rq import rq_decode, rq_encode, rq_train
from ..utils.config import config
from .base import as_matrix
from .pq import PQIndex

#: beam width for encoding (faiss ResidualQuantizer default beam is wider;
#: 4 keeps ingest one matmul per stage per 4 candidates and recovers most
#: of the quantization error vs greedy).
DEFAULT_BEAM = 4


class RQIndex(PQIndex):
    codec = "rq"

    def __init__(self, d: int, metric: Metric, metric_arg: float = 0.0,
                 M: int = 8, nbits: int = 8):
        # Skip PQIndex.__init__'s d % M requirement: RQ stages are
        # full-dimension, any (d, M) combination is valid.
        if metric.name not in ("L2", "INNER_PRODUCT"):
            raise errors.InvalidInputError(
                f"RQ indexes support only L2 and INNER_PRODUCT metrics, "
                f"got {metric.name}")
        if not 1 <= int(nbits) <= 8:
            # Codes are stored one uint8 per stage; >8 bits would silently
            # wrap the beam-search picks mod 256.
            raise errors.InvalidInputError(
                f"RQ supports 1-8 bits per stage (uint8 code storage), "
                f"got {nbits}")
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
        if params.get_float("anisotropic_eta") is not None:
            raise errors.InvalidInputError(
                "anisotropic_eta applies to PQ codebooks only (the RQ "
                "encoder has no score-aware variant yet)")
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

    # search_dispatch / range_search are inherited from PQIndex — the
    # codec class attribute routes them through the additive decoder.

    def state_dict(self) -> dict:
        state = super().state_dict()
        state["rq_meta"] = np.array([self.beam])
        return state

    def load_state(self, state: dict) -> None:
        meta = state.pop("rq_meta", None)
        if meta is not None:
            self.beam = int(meta[0])
        super().load_state(state)
