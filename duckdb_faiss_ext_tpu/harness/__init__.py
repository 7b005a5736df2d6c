"""Benchmark & conformance harness.

Python port of the reference's Go/cgo benchmark tier (SURVEY.md §2.4,§3.5):
the three filtered-search strategies (post-filter / bitmap selector / id-set
selector) with the binomial required-k computation, dataset loaders
(synthetic, fvecs/bvecs SIFT-format), recall measurement, and TREC run-file
emission for accuracy conformance.
"""

from .filtered import FilteredBenchResult, required_k, run_filtered_bench
from .datasets import load_fvecs, load_ivecs, synthetic_dataset
from .recall import recall_at_k
from .autotune import AutotuneResult, OperatingPoint, autotune_index

__all__ = [
    "AutotuneResult",
    "OperatingPoint",
    "autotune_index",
    "FilteredBenchResult",
    "required_k",
    "run_filtered_bench",
    "load_fvecs",
    "load_ivecs",
    "synthetic_dataset",
    "recall_at_k",
]
