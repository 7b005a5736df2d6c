"""Three-strategy filtered-search benchmark.

Port of the reference's Go benchmark core (go/main_test.go:18-51,
go/benches_c.go:124-201): for each filter passrate, compare

* **post**: plain search with an enlarged k' followed by filtering the
  results (the reference's SQL JOIN + WHERE);
* **sel**:  faiss_search_filter — dense-bitmap selector, O(n);
* **set**:  faiss_search_filter_set — id-set selector, O(m).

The enlarged k' is the smallest k such that P[Binomial(k, passrate) ≥ want]
≥ 0.99, found by bisection exactly like go/main_test.go:104-128.
"""

from __future__ import annotations

import dataclasses
import time
from math import lgamma, exp

import numpy as np

from .. import api
from ..catalog import Catalog
from ..sql.engine import Database


def _binom_pmf(k: int, n: int, p: float) -> float:
    if p <= 0.0:
        return 1.0 if k == 0 else 0.0
    if p >= 1.0:
        return 1.0 if k == n else 0.0
    logc = lgamma(n + 1) - lgamma(k + 1) - lgamma(n - k + 1)
    return exp(logc + k * np.log(p) + (n - k) * np.log1p(-p))


def prob_at_least(want: int, n: int, p: float) -> float:
    """P[Binomial(n, p) >= want]."""
    return 1.0 - sum(_binom_pmf(i, n, p) for i in range(min(want, n + 1)))


def required_k(want: int, passrate: float, confidence: float = 0.99,
               upper: int = 1 << 20) -> int:
    """Smallest k with P[Binomial(k, passrate) ≥ want] ≥ confidence
    (bisection, go/main_test.go:104-128)."""
    lo, hi = want, upper
    while lo < hi:
        mid = (lo + hi) // 2
        if prob_at_least(want, mid, passrate) >= confidence:
            hi = mid
        else:
            lo = mid + 1
    return lo


@dataclasses.dataclass
class FilteredBenchResult:
    passrate: float
    required_k: int
    qps_post: float
    qps_sel: float
    qps_set: float


def run_filtered_bench(
    index_name: str,
    queries: np.ndarray,
    table: str,
    id_column: str,
    passrates=(0.01, 0.10, 0.50, 0.99),
    want: int = 10,
    catalog: Catalog | None = None,
    database: Database | None = None,
    params=None,
    iters: int = 3,
) -> list[FilteredBenchResult]:
    """Benchmark the three strategies.  The filter predicate is
    ``id % 100 < passrate*100`` over the registered table — the reference's
    ``sel=i%100`` scheme (go/benches_c.go:31)."""
    from ..sql.engine import default_database

    db = database if database is not None else default_database()
    nq = queries.shape[0]
    out = []
    for p in passrates:
        kp = required_k(want, p)
        thresh = max(1, int(round(p * 100)))
        filt = f"{id_column}%100<{thresh}"

        def post():
            res = api.faiss_search(index_name, kp, queries, params, catalog)
            keep = (res["label"] % 100) < thresh
            return res, keep

        def sel():
            return api.faiss_search_filter(index_name, want, queries, filt,
                                           id_column, table, params, catalog,
                                           database=db)

        def sset():
            return api.faiss_search_filter_set(index_name, want, queries,
                                               filt, id_column, table,
                                               params, catalog, database=db)

        def timeit(fn):
            fn()  # warmup/compile
            t0 = time.perf_counter()
            for _ in range(iters):
                fn()
            return nq * iters / (time.perf_counter() - t0)

        out.append(FilteredBenchResult(
            passrate=p, required_k=kp,
            qps_post=timeit(post), qps_sel=timeit(sel), qps_set=timeit(sset)))
    return out
