"""Index model graph: composable index types built by the factory parser.

Equivalents of the FAISS index classes the reference exercises through
``faiss::index_factory`` (src/faiss_extension.cpp:154-155): Flat, IDMap, IVF,
HNSW(-compatible), PQ — re-designed as JAX computations over padded device
arrays instead of pointer-chasing C++ structures.
"""

from .base import Index, SearchResult
from .flat import FlatIndex
from .idmap import IDMapIndex

__all__ = ["Index", "SearchResult", "FlatIndex", "IDMapIndex"]
