"""Randomized property tests vs numpy brute-force oracles.

Catches block-boundary/padding/masking bugs the golden tests can't: shapes,
k values, metrics, and selectors are sampled across the padding regimes
(n below/at/above capacity buckets, k near block sizes)."""

import numpy as np
import pytest

import duckdb_faiss_ext_tpu as dfx
from duckdb_faiss_ext_tpu.metrics import resolve_metric
from duckdb_faiss_ext_tpu.factory import build_index

from test_metrics import oracle_distance  # noqa: E402  (same test dir)

RNG = np.random.default_rng(123)

CASES = [
    # (n, d, nq, k, metric)
    (1, 4, 1, 1, "L2"),
    (127, 8, 3, 5, "L2"),
    (128, 8, 3, 128, "INNER_PRODUCT"),
    (129, 16, 9, 10, "L2"),
    (1000, 8, 10, 2, "INNER_PRODUCT"),
    (513, 32, 17, 100, "L1"),
    (300, 8, 5, 300, "Linf"),
    (2048, 8, 2, 7, "Jaccard"),
]


def oracle_search(xb, xq, k, metric, mask=None):
    sim = resolve_metric(metric).is_similarity
    nq = xq.shape[0]
    d_all = np.array([[oracle_distance(q, b, metric) for b in xb]
                      for q in xq])
    if mask is not None:
        d_all = np.where(mask[None, :], d_all,
                         -np.inf if sim else np.inf)
    order = np.argsort(-d_all if sim else d_all, axis=1, kind="stable")
    return d_all, order[:, :k]


@pytest.mark.parametrize("n,d,nq,k,metric", CASES)
def test_flat_matches_oracle(n, d, nq, k, metric, catalog):
    xb = RNG.random((n, d)).astype(np.float32) + 0.01
    xq = RNG.random((nq, d)).astype(np.float32) + 0.01
    idx = build_index(d, "Flat", resolve_metric(metric))
    idx.add(xb)
    res = idx.search(xq, k)
    d_all, expect = oracle_search(xb, xq, min(k, n), metric)
    for q in range(nq):
        got = res.labels[q]
        valid = got[got >= 0]
        assert valid.size == min(k, n)
        np.testing.assert_allclose(
            np.sort(res.distances[q][: valid.size]),
            np.sort(d_all[q][expect[q]]), rtol=2e-4, atol=1e-5)
        # padding beyond n rows
        assert (got[valid.size:] == -1).all()


@pytest.mark.parametrize("seed", range(4))
def test_flat_masked_matches_oracle(seed, catalog):
    rng = np.random.default_rng(seed)
    n, d, nq, k = rng.integers(50, 400), 8, 5, int(rng.integers(1, 20))
    xb = rng.random((n, d)).astype(np.float32)
    xq = rng.random((nq, d)).astype(np.float32)
    keep = rng.random(n) < 0.3
    idx = build_index(d, "Flat", resolve_metric("L2"))
    idx.add(xb)
    from duckdb_faiss_ext_tpu.ops.selectors import BitmapSelector

    res = idx.search(xq, k, selector=BitmapSelector.from_bool(keep))
    d_all, _ = oracle_search(xb, xq, k, "L2", mask=keep)
    nkeep = int(keep.sum())
    for q in range(nq):
        got = res.labels[q]
        valid = got[got >= 0]
        assert valid.size == min(k, nkeep)
        assert keep[valid].all()
        expect_d = np.sort(d_all[q][keep])[: valid.size]
        np.testing.assert_allclose(res.distances[q][: valid.size],
                                   expect_d, rtol=2e-4, atol=1e-5)


def test_save_load_roundtrip_all_factories(catalog, tmp_path):
    """Every supported factory string survives save→load bit-for-bit."""
    rng = np.random.default_rng(7)
    d, n = 16, 600
    xb = rng.random((n, d)).astype(np.float32)
    ids = np.arange(n, dtype=np.int64) + 5
    factories = ["Flat", "IDMap,Flat", "IDMap2,Flat", "HNSW16",
                 "IDMap,HNSW32,Flat", "IVF4,Flat", "IDMap,IVF4,Flat",
                 "IVF4_HNSW8,Flat", "PQ4", "IVF4,PQ4", "SQ8", "SQfp16",
                 "SQ4", "SQ6", "IVF4,SQ8", "IVF4,SQ4", "IVF4,SQfp16",
                 "PQ4,RFlat", "IVF4,PQ4,RFlat", "IDMap,PQ4,RFlat",
                 "PCA8,Flat", "PCAR8,Flat", "PCAW8,Flat", "L2norm,Flat",
                 "OPQ4,PQ4", "OPQ4_8,IVF4,PQ4", "PCA8,SQ8",
                 "IDMap,OPQ4,IVF4,PQ4",
                 "LSH", "LSHr", "LSHt", "LSHrt", "LSH24r", "IDMap,LSH",
                 "SQbf16", "IVF4,SQbf16",
                 "RR,Flat", "RR8,Flat", "ITQ,Flat", "ITQ8,LSH16",
                 "NSG16", "NSG16,SQ8", "IMI2x2,Flat", "IMI2x2,PQ4",
                 "IDMap,IMI2x2,Flat", "IVF4(IVF2,Flat)", "Pad24,Flat", "RQ2x4", "IDMap,RQ2x4", "RQ2x4,RFlat", "IVF4,RQ2x4",
                 "IVF4(IVF2,Flat),PQ4"]
    for i, desc in enumerate(factories):
        name = f"rt{i}"
        dfx.faiss_create(name, d, desc, metric_type="L2", catalog=catalog)
        data = ((ids, xb) if desc.startswith("IDMap") else xb)
        dfx.faiss_add(data, name, catalog=catalog)
        a = dfx.faiss_search(name, 4, xb[:3], {"nprobe": "4"},
                             catalog=catalog)
        p = str(tmp_path / f"{name}.dfx")
        dfx.faiss_save(name, p, catalog=catalog)
        dfx.faiss_load(name + "b", p, catalog=catalog)
        b = dfx.faiss_search(name + "b", 4, xb[:3], {"nprobe": "4"},
                             catalog=catalog)
        np.testing.assert_array_equal(a["label"], b["label"], err_msg=desc)
        np.testing.assert_allclose(a["distance"], b["distance"], rtol=1e-6,
                                   err_msg=desc)
