"""Flat (exact brute-force) index over a padded device buffer.

The TPU-native IndexFlat: vectors live in a host mirror (numpy, the source of
truth for add/save/rebuild) and a device buffer padded to a power-of-two
capacity so jit caches stay warm across adds.  Search is the fused
distance-scan + top-k kernel (ops/flat_search.py).

"Mutable add against immutable XLA buffers" (SURVEY.md §7 hard part 3) is
solved by capacity bucketing: the device buffer is re-materialised only when
the capacity bucket grows (amortised O(n) like std::vector), not per add.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..metrics import Metric
from ..ops.flat_search import SIMILARITY_METRICS, flat_search
from ..ops import pallas_topk
from ..ops.selectors import Selector
from ..utils.config import config, next_pow2, on_tpu, pad_rows
from ..utils.transfer import fetch_results
from .base import Index, SearchResult, as_matrix


class FlatIndex(Index):
    def __init__(self, d: int, metric: Metric, metric_arg: float = 0.0):
        super().__init__(d, metric, metric_arg)
        self._xb = np.empty((0, d), dtype=np.float32)
        self._version = 0
        self._device_xb: jax.Array | None = None  # (cap, d), cap = pow2
        self._mask_cache: dict = {}

    # --- storage ---------------------------------------------------------
    @property
    def ntotal(self) -> int:
        return self._xb.shape[0]

    @property
    def version(self) -> int:
        return self._version

    def add(self, x) -> None:
        x = as_matrix(x, self.d)
        if x.shape[0] == 0:
            return
        self._xb = np.concatenate([self._xb, x], axis=0) if self.ntotal else x
        self._version += 1
        self._device_xb = None
        self._mask_cache.clear()

    def vectors(self) -> np.ndarray:
        """Host view of stored vectors (n, d)."""
        return self._xb

    def reconstruct(self, key: int) -> np.ndarray:
        return self._xb[key]

    def _capacity(self) -> int:
        return max(config.min_capacity, next_pow2(max(self.ntotal, 1)))

    def device_vectors(self) -> jax.Array:
        """Padded (cap, d) device buffer; re-uploaded only when the capacity
        bucket changed or data was invalidated."""
        cap = self._capacity()
        if self._device_xb is None or self._device_xb.shape[0] != cap:
            self._device_xb = jnp.asarray(pad_rows(self._xb, cap))
        return self._device_xb

    # --- selector masks ---------------------------------------------------
    def _selector_mask(self, selector: Selector) -> jax.Array:
        key = (selector.cache_key(), self._version)
        hit = self._mask_cache.get(key)
        if hit is not None:
            return hit
        rows = selector.contains(self.row_labels())
        mask = jnp.asarray(pad_rows(rows, self._capacity(), fill=False))
        self._mask_cache = {key: mask}  # keep only the latest
        return mask

    # --- search ----------------------------------------------------------
    def search(self, xq, k, params=None, selector=None) -> SearchResult:
        xq = as_matrix(xq, self.d)
        nq = xq.shape[0]
        k = int(k)
        sentinel = float("-inf") if self.metric.name in SIMILARITY_METRICS \
            else float("inf")
        if nq == 0 or k <= 0:
            return SearchResult(
                np.full((nq, max(k, 0)), sentinel, np.float32),
                np.full((nq, max(k, 0)), -1, np.int64),
            )

        cap = self._capacity()
        k_eff = min(k, cap)
        nq_pad = max(config.min_query_bucket, next_pow2(nq))
        xq_pad = jnp.asarray(pad_rows(xq, nq_pad))
        mask = self._selector_mask(selector) if selector is not None else None

        dist, pos = self._dispatch_search(xq_pad, k_eff, mask)
        dist, pos = fetch_results(dist, pos)
        dist = dist[:nq]
        pos = pos[:nq].astype(np.int64)
        labels = self._positions_to_labels(pos)
        if k_eff < k:
            dist = np.concatenate(
                [dist, np.full((nq, k - k_eff), sentinel, np.float32)], axis=1)
            labels = np.concatenate(
                [labels, np.full((nq, k - k_eff), -1, np.int64)], axis=1)
        return SearchResult(dist, labels)

    def _dispatch_search(self, xq_pad, k_eff, mask):
        """Pick the search kernel: the Pallas fused kernel on TPU for
        MXU metrics, the XLA scan otherwise (or as forced by config)."""
        # Measured on v5e: the query-blocked XLA layout (one wide matmul +
        # one TopK custom-call per block) currently beats the Pallas kernel,
        # whose in-kernel merge is latency-bound on cross-lane reductions —
        # so "auto" resolves to XLA and "pallas" is explicit opt-in until
        # the kernel wins its rematch.
        mode = config.kernel_mode
        xb = self.device_vectors()
        multi_device = len(getattr(xb, "devices", lambda: [None])()) > 1
        # Measured on v5e: the Pallas kernel's tile-skip (one max-reduction
        # per corpus tile once the top-k stabilises, k-slot-tight threshold)
        # beats the query-blocked XLA layout up to ~1k-query batches
        # (2.3 ms vs 42 ms at Q=64; 51 ms vs 86 ms at Q=1024 over 1M×128);
        # beyond that the XLA layout's streaming matmuls win.
        use_pallas = (
            mode != "xla"
            and not multi_device  # sharded buffers go through XLA+GSPMD
            and pallas_topk.supports(self.metric.name, k_eff, self.d)
            and (mode == "pallas"
                 or (on_tpu() and xq_pad.shape[0] <= 1024))
        )
        if use_pallas:
            return pallas_topk.pallas_flat_search(
                self.device_vectors(), self.ntotal, xq_pad, k_eff,
                self.metric.name, mask=mask, precision=config.precision,
                interpret=not on_tpu())
        return flat_search(
            self.device_vectors(), self.ntotal, xq_pad, k_eff,
            self.metric.name, self.metric_arg, mask=mask,
            precision=config.precision)

    def _positions_to_labels(self, pos: np.ndarray) -> np.ndarray:
        # Flat labels are storage positions; -1 (missing) passes through.
        return pos

    # --- serialization ----------------------------------------------------
    def state_dict(self) -> dict:
        return {"xb": self._xb}

    def load_state(self, state: dict) -> None:
        self._xb = np.asarray(state["xb"], dtype=np.float32).reshape(-1, self.d)
        self._version += 1
        self._device_xb = None
        self._mask_cache.clear()
