"""duckdb_faiss_ext_tpu — a TPU-native vector-similarity-search engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
``duckdb-faiss-ext`` reference (a DuckDB extension embedding FAISS): named
index create/train/add/search/filtered-search/save/load/destroy over nine
distance metrics, with distance + top-k fused into MXU kernels, IVF as
coarse-assign + padded list scans, filtered search as selection-vector
semi-joins fused into the scan, and multi-chip scaling via sharded meshes
with distributed top-k merges.

Public surface mirrors the reference's 12 SQL functions (see api.py), plus
the index catalog, metric registry, factory parser, SQL filter tier, and the
parallel placement/search APIs.
"""

def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache (~/.cache/dfx_jax, override with
    DFX_COMPILE_CACHE, disable with DFX_COMPILE_CACHE=0).

    Every new jit shape costs 10-40 s of remote compilation through a
    tunneled TPU runtime; the cache makes repeat shapes (across processes
    and sessions) near-instant.  JAX treats the cache as best-effort —
    serialize/deserialize failures fall back to a fresh compile."""
    import os

    path = os.environ.get("DFX_COMPILE_CACHE",
                          os.path.expanduser("~/.cache/dfx_jax"))
    if path == "0":
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — cache is an optimization only
        pass


_enable_compile_cache()

from .api import (
    register_create_parameter,
    RESULT_DTYPE,
    create_mask,
    faiss_add,
    faiss_add_device,
    faiss_create,
    faiss_create_params,
    faiss_destroy,
    faiss_load,
    faiss_manual_train,
    faiss_range_search,
    faiss_train_device,
    faiss_save,
    faiss_search,
    faiss_search_batched,
    faiss_search_filter,
    faiss_search_filter_set,
    faiss_stats,
    faiss_to_device,
)
from .catalog import GLOBAL_CATALOG, Catalog, IndexEntry
from .errors import InvalidInputError
from .factory import build_index
from .metrics import metric_names, resolve_metric
from .ops.selectors import BitmapSelector, SetSelector
from .params import ParamMap
from .sql import Database, register_table
from .utils.config import set_kernel_mode, set_precision, set_sq_dot

__version__ = "0.1.0"

__all__ = [
    "RESULT_DTYPE",
    "create_mask",
    "faiss_add",
    "faiss_add_device",
    "faiss_create",
    "faiss_create_params",
    "faiss_destroy",
    "faiss_load",
    "faiss_manual_train",
    "faiss_range_search",
    "faiss_train_device",
    "faiss_save",
    "faiss_search",
    "faiss_search_batched",
    "faiss_search_filter",
    "faiss_search_filter_set",
    "faiss_stats",
    "faiss_to_device",
    "GLOBAL_CATALOG",
    "Catalog",
    "IndexEntry",
    "InvalidInputError",
    "build_index",
    "metric_names",
    "resolve_metric",
    "BitmapSelector",
    "SetSelector",
    "ParamMap",
    "Database",
    "register_create_parameter",
    "register_table",
    "set_kernel_mode",
    "set_sq_dot",
    "set_precision",
]
