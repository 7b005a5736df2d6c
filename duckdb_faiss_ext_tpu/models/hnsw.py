"""HNSW-compatible index surface.

The reference builds faiss::IndexHNSW via factory strings (``HNSW16``,
``IDMap,HNSW32``, ``IDMap,HNSW128,Flat``) and tunes it through
``efConstruction`` at create time and ``efSearch`` at search time
(src/faiss_extension.cpp:133-141, 691-702).

Graph-walking ANN is TPU-hostile (pointer chasing, data-dependent control
flow — SURVEY.md §2.2), so this index accepts the full HNSW surface —
factory string, efConstruction/efSearch parameters — but executes searches
as the fused exact MXU scan (FlatIndex).  Documented deviation: same API,
recall ≥ HNSW's by construction (exact results), different algorithm; the
parameters are validated and recorded but do not alter results.  This is the
"lower to TPU-friendly exact/IVF scan" decision of SURVEY.md §7 step 8.
"""

from __future__ import annotations

import numpy as np

from ..metrics import Metric
from ..params import EMPTY
from .base import SearchResult
from .flat import FlatIndex


class HNSWIndex(FlatIndex):
    def __init__(self, d: int, metric: Metric, metric_arg: float = 0.0,
                 M: int = 32, storage: str = "Flat"):
        super().__init__(d, metric, metric_arg)
        self.M = int(M)
        self.storage = storage
        self.ef_construction = 40  # faiss::HNSW default
        self.ef_search = 16        # faiss::HNSW default

    def apply_create_params(self, params) -> None:
        # The only create-time knob the reference implements
        # (src/faiss_extension.cpp:133-141).
        ef = params.get_int("efConstruction")
        if ef is not None:
            self.ef_construction = ef

    def search(self, xq, k, params=EMPTY, selector=None) -> SearchResult:
        # efSearch accepted for parity (src/faiss_extension.cpp:691-702);
        # results are exact regardless.
        ef = params.get_int("efSearch")
        if ef is not None:
            self.ef_search = ef
        return super().search(xq, k, params, selector)

    def state_dict(self) -> dict:
        state = super().state_dict()
        state["hnsw_meta"] = np.array(
            [self.M, self.ef_construction, self.ef_search])
        return state

    def load_state(self, state: dict) -> None:
        meta = state.pop("hnsw_meta", None)
        if meta is not None:
            m = [int(v) for v in meta]
            self.M, self.ef_construction, self.ef_search = m
        super().load_state(state)
