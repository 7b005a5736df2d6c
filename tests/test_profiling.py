"""Observability: op timing stats and faiss_stats."""

import numpy as np

import duckdb_faiss_ext_tpu as dfx
from duckdb_faiss_ext_tpu.utils import profiling


def test_op_stats_accumulate(catalog):
    profiling.reset_stats()
    xb = np.random.default_rng(0).random((100, 8), dtype=np.float32)
    dfx.faiss_create("p", 8, "Flat", metric_type="L2", catalog=catalog)
    dfx.faiss_add(xb, "p", catalog=catalog)
    dfx.faiss_search("p", 3, xb[:4], catalog=catalog)
    dfx.faiss_search("p", 3, xb[:4], catalog=catalog)

    s = profiling.stats()
    assert s["faiss_add"]["count"] == 1
    assert s["faiss_search"]["count"] == 2
    assert s["faiss_search"]["mean_ms"] > 0


def test_faiss_stats(catalog):
    xb = np.random.default_rng(0).random((100, 8), dtype=np.float32)
    dfx.faiss_create("st", 8, "IVF4,Flat", metric_type="L2",
                     catalog=catalog)
    dfx.faiss_add(xb, "st", catalog=catalog)
    info = dfx.faiss_stats("st", catalog=catalog)
    ix = info["indexes"]["st"]
    assert ix["factory"] == "IVF4,Flat"
    assert ix["ntotal"] == 100
    assert ix["is_trained"] is True
    assert ix["metric"] == "L2"
    assert "ops" in info


def test_k_edge_cases(catalog):
    """k=1 and large k through both capacity regimes."""
    rng = np.random.default_rng(1)
    xb = rng.random((300, 8), dtype=np.float32)
    dfx.faiss_create("ke", 8, "Flat", metric_type="L2", catalog=catalog)
    dfx.faiss_add(xb, "ke", catalog=catalog)
    r1 = dfx.faiss_search("ke", 1, xb[:3], catalog=catalog)
    assert r1.shape == (3, 1)
    np.testing.assert_array_equal(r1["label"][:, 0], np.arange(3))
    r100 = dfx.faiss_search("ke", 100, xb[:2], catalog=catalog)
    assert r100.shape == (2, 100)
    assert (r100["label"] >= 0).all()  # 300 rows ≥ 100
    # distances are non-decreasing with rank (min metric)
    assert (np.diff(r100["distance"], axis=1) >= -1e-6).all()
